"""Training metrics logging: results dict -> CSV / JSON / plot.

Mirrors the reference's observability surface (train_base.py:93-96,253-277):
a ``defaultdict(list)`` results dict appended everywhere, dumped to
``results.json`` + per-metric CSVs + a ``performance.png`` at finalize.
TensorBoard is replaced by these files plus stdout (the reference's
SummaryWriter already degrades to a no-op without tensorboard,
train_base.py:8-27).
"""

import json
import os
from collections import defaultdict

import numpy as np


class ResultsLogger:
    def __init__(self, save_path, tensorboard=False):
        self.save_path = save_path
        os.makedirs(save_path, exist_ok=True)
        self.results = defaultdict(list)
        # match the reference's offset so losses and evals align
        # (train_base.py:96)
        self.results["loss"].append(0)
        # import-guarded TensorBoard scalars, like the reference's no-op
        # SummaryWriter fallback (train_base.py:8-27)
        self._tb = None
        self._tb_steps = defaultdict(int)
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(save_path)
            except Exception as exc:
                print(
                    "tensorboard requested but unavailable "
                    f"({exc!r}); falling back to CSV/JSON logging"
                )

    def log(self, key, value):
        self.results[key].append(
            float(value) if np.isscalar(value) or hasattr(value, "item") else value
        )
        if self._tb is not None and np.isscalar(self.results[key][-1]):
            # per-key step counter: the seeded loss sentinel (above) is a
            # results-list alignment artifact and must not offset TB steps
            self._tb.add_scalar(key, self.results[key][-1],
                                self._tb_steps[key])
            self._tb_steps[key] += 1

    def log_dict(self, d):
        for k, v in d.items():
            self.log(k, v)

    _CSV_KEYS = (
        "mean_success", "std_success", "loss", "mean_divergence_full",
        "std_divergence_full", "mean_divergence", "std_divergence",
    )

    def finalize(self, plot=True):
        """Dump CSVs + results.json (+ performance plot) like
        TrainBase.finalize (train_base.py:253-277)."""
        for key in self._CSV_KEYS:
            if self.results.get(key):
                np.savetxt(
                    os.path.join(self.save_path, f"{key}.csv"),
                    np.asarray(self.results[key], dtype=float),
                    delimiter=",",
                )
        with open(os.path.join(self.save_path, "results.json"), "w") as f:
            json.dump(
                {k: v for k, v in self.results.items()}, f, default=float
            )
        if plot:
            try:
                self._plot()
            except Exception as exc:  # matplotlib optional/headless issues
                print(f"performance plot skipped: {exc}")
        if self._tb is not None:
            self._tb.flush()

    def _plot(self):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 2, figsize=(10, 4))
        if self.results.get("loss"):
            axes[0].plot(self.results["loss"])
            axes[0].set_title("loss")
        if self.results.get("mean_success"):
            m = np.asarray(self.results["mean_success"], dtype=float)
            s = np.asarray(
                self.results.get("std_success", np.zeros_like(m)), dtype=float
            )
            axes[1].plot(m)
            if len(s) == len(m):
                axes[1].fill_between(
                    np.arange(len(m)), m - s, m + s, alpha=0.3
                )
            axes[1].set_title("success")
        fig.tight_layout()
        fig.savefig(os.path.join(self.save_path, "performance.png"))
        plt.close(fig)
