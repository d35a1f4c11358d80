"""Reproduce the REFERENCE_CPU_SEGMENTS_PER_SEC constant in bench.py.

Models the reference pipeline's per-segment CPU cost as two serial
stages, both measured on this container:

1. librosa-CQT proxy: per-segment FFT-based CQT (9 frames x rfft(32768)
   + dense spectral filterbank matmul + |.|^4).  This is *generous* to
   the reference — librosa's recursive algorithm does strictly more work
   per segment (multi-rate resampling) than this single-FFT proxy, and
   librosa itself is not installed in this image to measure directly.
2. torch ResNet18+heads train step (reference GuitarTabNet topology) at
   batch 32 on CPU.

Combined throughput = 1 / (1/cqt + 1/train)  [segments/sec].
"""

import os
import sys
import time

import numpy as np
import scipy.fft
import torch
import torch.nn as tnn

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure_cqt_proxy(n_iter: int = 50) -> float:
    rng = np.random.default_rng(0)
    frames = rng.standard_normal((9, 32768)).astype(np.float32)
    kernel = (
        rng.standard_normal((16385, 96)) + 1j * rng.standard_normal((16385, 96))
    ).astype(np.complex64)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        spec = scipy.fft.rfft(frames, axis=1)
        np.abs(spec @ kernel) ** 4
    return n_iter / (time.perf_counter() - t0)


def _resnet18_tabnet():
    """Reference GuitarTabNet topology (bestengine.py:18-48) without
    torchvision (not installed): conv stem + 4x2 BasicBlocks + 6 branches."""

    class Block(tnn.Module):
        def __init__(self, cin, cout, stride=1):
            super().__init__()
            self.c1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.b1 = tnn.BatchNorm2d(cout)
            self.c2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.b2 = tnn.BatchNorm2d(cout)
            self.down = (
                tnn.Sequential(
                    tnn.Conv2d(cin, cout, 1, stride, bias=False),
                    tnn.BatchNorm2d(cout),
                )
                if (stride != 1 or cin != cout)
                else None
            )

        def forward(self, x):
            idt = x if self.down is None else self.down(x)
            y = torch.relu(self.b1(self.c1(x)))
            return torch.relu(self.b2(self.c2(y)) + idt)

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            self.stem = tnn.Sequential(
                tnn.Conv2d(3, 64, 7, 2, 3, bias=False),
                tnn.BatchNorm2d(64), tnn.ReLU(), tnn.MaxPool2d(3, 2, 1),
            )
            layers = []
            cin = 64
            for cout, stride in [(64, 1), (64, 1), (128, 2), (128, 1),
                                 (256, 2), (256, 1), (512, 2), (512, 1)]:
                layers.append(Block(cin, cout, stride))
                cin = cout
            self.body = tnn.Sequential(*layers)
            self.fc = tnn.Linear(512, 256)
            self.branches = tnn.ModuleList(
                [
                    tnn.Sequential(
                        tnn.Linear(256, 128), tnn.ReLU(), tnn.BatchNorm1d(128),
                        tnn.Dropout(0.3), tnn.Linear(128, 64), tnn.ReLU(),
                        tnn.BatchNorm1d(64), tnn.Dropout(0.2), tnn.Linear(64, 19),
                    )
                    for _ in range(6)
                ]
            )

        def forward(self, x):
            x = self.body(self.stem(x)).mean(dim=(2, 3))
            f = self.fc(x)
            return [b(f) for b in self.branches]

    return Net()


def measure_train_step(batch: int = 32, n_iter: int = 5) -> float:
    model = _resnet18_tabnet()
    model.train()
    opt = torch.optim.Adam(model.parameters(), lr=5e-4, weight_decay=1e-5)
    crit = tnn.CrossEntropyLoss()
    x = torch.randn(batch, 3, 224, 224)
    y = torch.randint(0, 19, (batch, 6))

    def step():
        opt.zero_grad()
        outs = model(x)
        loss = sum(crit(outs[s], y[:, s]) for s in range(6)) / 6
        loss.backward()
        tnn.utils.clip_grad_norm_(model.parameters(), 1.0)
        opt.step()

    step()  # warm
    t0 = time.perf_counter()
    for _ in range(n_iter):
        step()
    return batch * n_iter / (time.perf_counter() - t0)


if __name__ == "__main__":
    cqt = measure_cqt_proxy()
    train = measure_train_step()
    combined = 1.0 / (1.0 / cqt + 1.0 / train)
    print(f"CQT proxy:  {cqt:8.1f} segments/sec")
    print(f"CNN train:  {train:8.1f} segments/sec")
    print(f"combined:   {combined:8.1f} segments/sec  (reference CPU baseline)")
