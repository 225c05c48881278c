from softgnss_tpu.track.scan import TrackResults, TrackState, initial_state, track  # noqa: F401
