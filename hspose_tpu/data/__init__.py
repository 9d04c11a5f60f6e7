from hspose_tpu.data.augment import augment_batch

__all__ = ["augment_batch"]
