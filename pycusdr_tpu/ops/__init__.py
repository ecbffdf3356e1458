from pycusdr_tpu.ops.doppler_search import (
    doppler_energy_matmul,
        find_doppler_estimate,
)
from pycusdr_tpu.ops.demod_kernels import (
    apply_best_doppler,
    find_code_rate_and_phase,
    find_centres,
    extract_bits_lut,
    extract_bits_nrzs,
    threshold_input,
    compute_snr,
    dilate_mask_dynamic,
)

__all__ = [
    "doppler_energy_matmul",
    "find_doppler_estimate",
    "apply_best_doppler",
    "find_code_rate_and_phase",
    "find_centres",
    "extract_bits_lut",
    "extract_bits_nrzs",
    "threshold_input",
    "compute_snr",
    "dilate_mask_dynamic",
]
