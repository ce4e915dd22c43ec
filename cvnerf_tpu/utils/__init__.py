"""Host-side utilities: images, video, metrics, PSNR."""

from cvnerf_tpu.utils.image import to_byte, psnr, write_png, write_video
from cvnerf_tpu.utils.metrics import MetricsLogger

__all__ = ["to_byte", "psnr", "write_png", "write_video", "MetricsLogger"]
