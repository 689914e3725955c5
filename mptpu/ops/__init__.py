"""L0 spectral kernel layer — pure, jittable JAX ops.

TPU-native re-design of the reference's ``modules/{fft,conv,stft,decompose,
overlap_add,upsample,normalization,softmax,normal_pdf}.py`` (see SURVEY.md §2.1).
"""

from .fft import (
    n_fft_coeffs,
    fft_convolve,
    simple_fft_convolve,
    fft_shift,
    randomize_phase,
    next_pow2,
)
from .correlation import mp_correlate, torch_style_conv
from .stft import stft, log_stft, stft_relative_phase, short_time_transform
from .decompose import (
    fft_frequency_decompose,
    fft_frequency_recompose,
    fft_resample,
    band_sizes,
)
from .overlap_add import overlap_add
from .upsample import (
    upsample_with_holes,
    interpolate_last_axis,
    ensure_last_axis_length,
)
from .norms import unit_norm, max_norm, limit_norm, example_norm
from .pdf import pdf, pdf2, gamma_pdf
from .ste import (
    sparse_softmax,
    soft_dirac,
    soft_clamp,
    step_func,
    hard_softmax,
    straight_through,
)
from .windows import hann_window
from .features import amplitude_envelope, mfcc, chroma, chroma_basis
from .phase import (
    windowed_audio,
    stft_complex,
    istft,
    mag_phase_decomposition,
    mag_phase_recomposition,
    AudioCodec,
)
from .custom_grads import (
    scalar_position,
    differentiable_fft_shift,
    schedule_atoms,
    position_render,
    diff_index,
)

__all__ = [
    "n_fft_coeffs",
    "fft_convolve",
    "simple_fft_convolve",
    "fft_shift",
    "randomize_phase",
    "next_pow2",
    "mp_correlate",
    "torch_style_conv",
    "stft",
    "log_stft",
    "stft_relative_phase",
    "short_time_transform",
    "fft_frequency_decompose",
    "fft_frequency_recompose",
    "fft_resample",
    "band_sizes",
    "overlap_add",
    "upsample_with_holes",
    "interpolate_last_axis",
    "ensure_last_axis_length",
    "unit_norm",
    "max_norm",
    "limit_norm",
    "example_norm",
    "pdf",
    "pdf2",
    "gamma_pdf",
    "sparse_softmax",
    "soft_dirac",
    "soft_clamp",
    "step_func",
    "hard_softmax",
    "straight_through",
    "hann_window",
    "amplitude_envelope",
    "mfcc",
    "chroma",
    "chroma_basis",
    "windowed_audio",
    "stft_complex",
    "istft",
    "mag_phase_decomposition",
    "mag_phase_recomposition",
    "AudioCodec",
    "scalar_position",
    "differentiable_fft_shift",
    "schedule_atoms",
    "position_render",
    "diff_index",
]
