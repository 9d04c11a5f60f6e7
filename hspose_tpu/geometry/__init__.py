from hspose_tpu.geometry import boxes, planes, rotations, symmetry

__all__ = ["boxes", "planes", "rotations", "symmetry"]
