"""Out-of-band device monitor daemon.

Reference: gpumon.py:34-108 — a background thread parsing nvidia-smi clocks /
throttle reasons and logging 30-sample means to wandb. TPU equivalent: a
thread sampling per-device HBM stats (memory_stats) and host RSS at an
interval, logging means to a jsonl sink and optionally wandb.
"""

from __future__ import annotations

import json
import os
import threading
import time
from typing import Optional

import jax


class DeviceMonitor:
    def __init__(
        self,
        log_path: str = "workspace/tpumon.jsonl",
        interval_s: float = 2.0,
        window: int = 30,
        wandb_run=None,
    ):
        self.log_path = log_path
        self.interval_s = interval_s
        self.window = window
        self.wandb_run = wandb_run
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self._samples: list[dict] = []

    def _sample(self) -> dict:
        out: dict = {"ts": time.time()}
        for i, dev in enumerate(jax.local_devices()):
            try:
                stats = dev.memory_stats() or {}
            except Exception:
                stats = {}
            out[f"dev{i}_bytes_in_use"] = stats.get("bytes_in_use", 0)
            out[f"dev{i}_peak_bytes"] = stats.get("peak_bytes_in_use", 0)
        try:
            with open("/proc/self/status") as f:
                for line in f:
                    if line.startswith("VmRSS"):
                        out["host_rss_kb"] = int(line.split()[1])
                        break
        except Exception:
            pass
        return out

    def _loop(self):
        os.makedirs(os.path.dirname(os.path.abspath(self.log_path)) or ".", exist_ok=True)
        with open(self.log_path, "a") as f:
            while not self._stop.is_set():
                self._samples.append(self._sample())
                if len(self._samples) >= self.window:
                    keys = [k for k in self._samples[0] if k != "ts"]
                    mean = {k: sum(s.get(k, 0) for s in self._samples) / len(self._samples) for k in keys}
                    mean["ts"] = self._samples[-1]["ts"]
                    f.write(json.dumps(mean) + "\n")
                    f.flush()
                    if self.wandb_run is not None:
                        self.wandb_run.log({f"tpumon/{k}": v for k, v in mean.items() if k != "ts"})
                    self._samples = []
                self._stop.wait(self.interval_s)

    def start(self) -> "DeviceMonitor":
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=5)
