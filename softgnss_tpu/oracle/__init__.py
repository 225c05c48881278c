from softgnss_tpu.oracle.numpy_rx import oracle_acquire_grid, oracle_track_channel  # noqa: F401
