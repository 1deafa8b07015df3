from rlvae_tpu.nets.cnn import CNNDecoder, CNNEncoder
from rlvae_tpu.nets.mlp import DiscriminatorMLP, MLPDecoder, MLPEncoder, SVAEEncoderMLP
from rlvae_tpu.nets.registry import create_decoder, create_encoder
from rlvae_tpu.nets.resnet import ResNetDecoder, ResNetEncoder

__all__ = [
    "MLPEncoder",
    "MLPDecoder",
    "SVAEEncoderMLP",
    "DiscriminatorMLP",
    "CNNEncoder",
    "CNNDecoder",
    "ResNetEncoder",
    "ResNetDecoder",
    "create_encoder",
    "create_decoder",
]
