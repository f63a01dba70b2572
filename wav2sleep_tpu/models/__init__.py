from .activations import get_activation
from .layers import Conv1D, ConvBlock1D, ConvLayer1D, DilatedConvBlock
from .norms import BatchNorm, ConvGroupNorm, ConvLayerNorm, ConvRMSNorm, InstanceNorm, get_norm
from .ppgnet import SleepPPGNet
from .transformer import TransformerEncoder, TransformerEncoderLayer
from .wav2sleep import (
    MultiModalAttentionEmbedder,
    SequenceCNN,
    SignalEncoder,
    SignalEncoders,
    Wav2Sleep,
    as_signal_map,
)

__all__ = [
    'get_activation',
    'get_norm',
    'Conv1D',
    'ConvLayer1D',
    'ConvBlock1D',
    'DilatedConvBlock',
    'BatchNorm',
    'ConvGroupNorm',
    'ConvLayerNorm',
    'ConvRMSNorm',
    'InstanceNorm',
    'TransformerEncoder',
    'TransformerEncoderLayer',
    'SignalEncoder',
    'SignalEncoders',
    'MultiModalAttentionEmbedder',
    'SequenceCNN',
    'Wav2Sleep',
    'SleepPPGNet',
    'as_signal_map',
]
