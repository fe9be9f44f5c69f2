"""Streaming renderer: batched TPU synthesis → device-side uint8 packing →
threaded host transfer → video encode (ffmpeg pipe / OpenCV fallback)."""

from .video import VideoWriter, write_video
from .frames import render

__all__ = ["VideoWriter", "write_video", "render"]
