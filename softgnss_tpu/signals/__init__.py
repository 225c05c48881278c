from softgnss_tpu.signals.ca import (  # noqa: F401
    G2_DELAYS,
    gold_code,
    gold_codes,
    padded_code,
    resample_indices,
    ca_table,
)
from softgnss_tpu.signals.nco import (  # noqa: F401
    CARRIER_FRAC_BITS,
    CODE_FRAC_BITS,
    CODE_ONE,
    carrier_step_u32,
    carrier_angles,
    code_step_q,
    chips_to_q,
    q_to_chips,
    ceil_chip_index,
)
