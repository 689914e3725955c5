"""L4 NN building blocks (flax.linen; SURVEY.md §2.1 encoder/MLP rows).

Modules are flax ``linen.Module``s — pure init/apply over param pytrees,
the functional JAX analog of the reference's nn.Modules.
"""

from .init import uniform_init
from .pos_encode import (
    positional_encoding,
    pos_encode_feature,
    pos_encoded,
    n_features_for_freq,
    LearnedPosEncodings,
)
from .linear import ResidualBlock, ResidualStack, LinearOutputStack
from .anticausal import (
    AntiCausalConv,
    AntiCausalBlock,
    AntiCausalStack,
    AntiCausalAnalysis,
)
from .multihead import MultiHeadTransform
from .mixer import MixerStack
from .dilated import DilatedStack
from .unet import UNet, DownsamplingDiscriminator
from .upsample import ConvUpsample
from .transformer import (
    Transformer,
    ForwardBlock,
    FourierMixer,
    fourier_mix,
    MetaFormer,
    MetaFormerBlock,
)

__all__ = [
    "uniform_init",
    "positional_encoding",
    "pos_encode_feature",
    "pos_encoded",
    "n_features_for_freq",
    "LearnedPosEncodings",
    "ResidualBlock",
    "ResidualStack",
    "LinearOutputStack",
    "AntiCausalConv",
    "AntiCausalBlock",
    "AntiCausalStack",
    "AntiCausalAnalysis",
    "MultiHeadTransform",
    "MixerStack",
    "DilatedStack",
    "UNet",
    "DownsamplingDiscriminator",
    "ConvUpsample",
    "Transformer",
    "ForwardBlock",
    "fourier_mix",
    "FourierMixer",
    "MetaFormer",
    "MetaFormerBlock",
]
