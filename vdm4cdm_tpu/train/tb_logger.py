"""Optional TensorBoard logger (scalar + figure images).

Part of the pluggable logging surface replacing the reference's Comet ML
dependency (SURVEY.md §5 metrics row). Uses tf.summary if tensorflow is
importable; construct explicitly and pass to Trainer(loggers=...).
"""

from __future__ import annotations

import io
from typing import Dict

from .loggers import Logger


class TensorBoardLogger(Logger):
    def __init__(self, log_dir: str):
        import tensorflow as tf  # optional dependency, env-provided

        self._tf = tf
        self._writer = tf.summary.create_file_writer(log_dir)

    def log_scalars(self, step: int, scalars: Dict[str, float]):
        with self._writer.as_default(step=step):
            for k, v in scalars.items():
                self._tf.summary.scalar(k, float(v))
        self._writer.flush()

    def log_figure(self, step: int, name: str, fig):
        buf = io.BytesIO()
        fig.savefig(buf, format="png", dpi=80)
        buf.seek(0)
        img = self._tf.image.decode_png(buf.getvalue(), channels=4)
        with self._writer.as_default(step=step):
            self._tf.summary.image(name, img[None])
        self._writer.flush()

    def close(self):
        self._writer.close()
