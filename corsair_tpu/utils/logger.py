"""Timestamped file+stdout logger (parity: ``utils/logger.py:21-33``)."""

from __future__ import annotations

import os
import time


class Logger:
    def __init__(self, log_dir: str = None, log_name: str = None):
        if log_dir is None or log_name is None:
            self.path = None  # stdout-only logger
            return
        self.path = os.path.join(log_dir, log_name)
        os.makedirs(log_dir, exist_ok=True)
        open(self.path, "w").close()

    def log(self, txt):
        t = time.strftime("%Y-%m-%d %H:%M:%S", time.localtime())
        print(f"{t} {txt}")
        if self.path is not None and isinstance(txt, str):
            with open(self.path, "a") as f:
                f.write(f"{t} {txt}\n")
