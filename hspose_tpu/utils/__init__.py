from hspose_tpu.utils.logging import MetricWriter, setup_logger

__all__ = ["MetricWriter", "setup_logger"]
