from rlvae_tpu.utils.output import ModelOutput

__all__ = ["ModelOutput"]
