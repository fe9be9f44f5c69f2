"""Video encoding sinks.

The reference pipes raw rgb24 into an ffmpeg subprocess (libx264 + source
audio mux, reference: render.py:58-91,195-212). This image has no ffmpeg
binary, so the writer is pluggable: ffmpeg pipe when available (same flags),
otherwise OpenCV VideoWriter (mp4), otherwise raw .npy dump — all behind one
`VideoWriter` interface.
"""

from __future__ import annotations

import os
import shutil
import subprocess
from typing import Optional

import numpy as np


class VideoWriter:
    """Streaming frame sink: feed HWC uint8 frames, close() finalizes."""

    def __init__(
        self,
        output_file: str,
        width: int,
        height: int,
        fps: float,
        audio_file: Optional[str] = None,
        offset: float = 0.0,
        duration: Optional[float] = None,
        ffmpeg_preset: str = "slow",
    ):
        self.output_file = output_file
        self.width = width
        self.height = height
        self.fps = fps
        self.n_written = 0
        self._proc = None
        self._cv = None

        os.makedirs(os.path.dirname(os.path.abspath(output_file)) or ".", exist_ok=True)
        ffmpeg = shutil.which("ffmpeg")
        if ffmpeg is not None:
            cmd = [ffmpeg, "-hide_banner", "-v", "warning", "-y",
                   "-f", "rawvideo", "-pix_fmt", "rgb24", "-s", f"{width}x{height}",
                   "-framerate", str(fps), "-i", "pipe:"]
            if audio_file is not None:
                cmd += ["-ss", str(offset)]
                if duration is not None:
                    cmd += ["-t", str(duration)]
                cmd += ["-i", audio_file, "-map", "0:v", "-map", "1:a",
                        "-audio_bitrate", "320K", "-ac", "2"]
            cmd += ["-vcodec", "libx264", "-pix_fmt", "yuv420p", "-preset", ffmpeg_preset, output_file]
            self._proc = subprocess.Popen(cmd, stdin=subprocess.PIPE)
            self.backend = "ffmpeg"
            return

        try:
            import cv2

            fourcc = cv2.VideoWriter_fourcc(*"mp4v")
            self._cv = cv2.VideoWriter(output_file, fourcc, fps, (width, height))
            if not self._cv.isOpened():
                self._cv = None
            else:
                self.backend = "opencv"
                self._cv2 = cv2
                return
        except Exception:
            self._cv = None

        # last resort: buffered npy (keeps tests hermetic)
        self._frames: list[np.ndarray] = []
        self.backend = "npy"

    def write(self, frame: np.ndarray) -> None:
        """frame: [H, W, 3] uint8 RGB."""
        assert frame.shape == (self.height, self.width, 3), (frame.shape, self.height, self.width)
        if self._proc is not None:
            self._proc.stdin.write(np.ascontiguousarray(frame).tobytes())
        elif self._cv is not None:
            self._cv.write(self._cv2.cvtColor(frame, self._cv2.COLOR_RGB2BGR))
        else:
            self._frames.append(frame.copy())
        self.n_written += 1

    def close(self) -> None:
        if self._proc is not None:
            self._proc.stdin.close()
            self._proc.wait()
        elif self._cv is not None:
            self._cv.release()
        else:
            np.save(self.output_file + ".npy" if not self.output_file.endswith(".npy") else self.output_file,
                    np.stack(self._frames) if self._frames else np.zeros((0, self.height, self.width, 3), np.uint8))


def write_video(arr: np.ndarray, output_file: str, fps: float) -> None:
    """One-shot array writer (reference: render.py:195-212)."""
    arr = np.asarray(arr)
    h, w = arr.shape[1], arr.shape[2]
    vw = VideoWriter(output_file, w, h, fps)
    for frame in arr:
        vw.write(frame.astype(np.uint8))
    vw.close()
