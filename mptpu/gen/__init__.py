"""L3 synthesis / event-generator layer — the decoder zoo
(reference ``modules/eventgenerators/`` + ``modules/{transfer,reverb,ddsp,
reds,impulse,ssm}.py``; SURVEY.md §2.1).

Event generators are pure ``generate(params_dict, ...) -> audio`` functions
plus a ``shape_spec`` dict declaring the latent heads that drive them (the
contract from reference ``eventgenerators/generator.py:6-12``); a
``MultiHeadTransform`` (mptpu.nn) materializes one MLP head per entry.
"""

from .generator import EventGenerator, ShapeSpec
from .schedule import (
    DiracScheduler,
    FFTShiftScheduler,
    HierarchicalDiracModel,
    hierarchical_dirac,
    interpretable_fft_shift,
)
from .transfer import (
    make_waves,
    make_waves_vectorized,
    freq_domain_transfer_function_to_resonance,
    damped_harmonic_oscillator,
    gaussian_bandpass_filtered,
    fft_convolve_correlation,
    ResonanceBank,
)
from .reverb import NeuralReverb, ReverbGenerator
from .ddsp import (
    noise_bank2,
    band_filtered_noise,
    oscillator_bank,
    harmonic_model,
    HarmonicModel,
)
from .splat import SplattingEventGenerator, exponential_decay
from .ssm import state_space_model, StateSpaceModelEventGenerator
from .impulse import GenerateImpulse, GenerateMix
from .reds import F0Resonance
from .reds_model import RedsLikeModel
from .convimpulse import ConvImpulseEventGenerator
from .overfitresonance import OverfitResonanceModel
from .waveguide import WaveguideSynth, waveguide_synth_scan
from .physical import gaussian_window, TransferFunctionSegmentGenerator
from .event_variants import (
    AudioModelEventGenerator,
    WavetableModel,
    SimpleEventGenerator,
)
from .instrument import InstrumentLayer, InstrumentStack
from .goo import SpringMesh, string_mesh, simulate as goo_simulate, pluck_forces
from .roomsim import RoomModel, roomsim
from .energy import (
    EnergyInstrumentModel,
    EnergyBlock,
    to_blocks,
    blocks_to_samples,
    compute_discontinuity,
)
from .recurrent import FrameSynth, RecurrentSynth
from .ssm_complex import ComplexSSM, CompressionModel, param_count
from .audiomodel import OscillatorBank as OscillatorBankModule, AudioModel
from .audiomodel import OscillatorBank
from .impulse import NoiseModel
from ..models.ssm_overfit import OverfitControlPlane
from .lookups import (
    SampleResonanceLookup,
    FFTResonanceLookup,
    WavetableLookup,
    MultibandResonanceLookup,
    MultiSSM,
)

__all__ = [
    "RoomModel",
    "roomsim",
    "EventGenerator",
    "ShapeSpec",
    "DiracScheduler",
    "FFTShiftScheduler",
    "HierarchicalDiracModel",
    "hierarchical_dirac",
    "interpretable_fft_shift",
    "make_waves",
    "make_waves_vectorized",
    "freq_domain_transfer_function_to_resonance",
    "damped_harmonic_oscillator",
    "gaussian_bandpass_filtered",
    "fft_convolve_correlation",
    "ResonanceBank",
    "NeuralReverb",
    "ReverbGenerator",
    "noise_bank2",
    "band_filtered_noise",
    "oscillator_bank",
    "harmonic_model",
    "SplattingEventGenerator",
    "exponential_decay",
    "state_space_model",
    "StateSpaceModelEventGenerator",
    "GenerateImpulse",
    "GenerateMix",
    "F0Resonance",
    "RedsLikeModel",
    "ConvImpulseEventGenerator",
    "OverfitResonanceModel",
    "WaveguideSynth",
    "waveguide_synth_scan",
    "gaussian_window",
    "TransferFunctionSegmentGenerator",
    "SampleResonanceLookup",
    "FFTResonanceLookup",
    "WavetableLookup",
    "MultibandResonanceLookup",
    "MultiSSM",
    "AudioModelEventGenerator",
    "WavetableModel",
    "SimpleEventGenerator",
    "InstrumentLayer",
    "InstrumentStack",
    "SpringMesh",
    "string_mesh",
    "goo_simulate",
    "pluck_forces",
    "EnergyInstrumentModel",
    "EnergyBlock",
    "to_blocks",
    "blocks_to_samples",
    "compute_discontinuity",
    "FrameSynth",
    "RecurrentSynth",
    "ComplexSSM",
    "CompressionModel",
    "param_count",
    "OscillatorBankModule",
    "OscillatorBank",
    "NoiseModel",
    "HarmonicModel",
    "OverfitControlPlane",
    "AudioModel",
]
