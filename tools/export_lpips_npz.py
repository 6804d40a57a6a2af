"""Export canonical AlexNet-LPIPS v0.1 weights to the npz consumed by
monogs_dev_tpu/eval/lpips.py.

Run in ANY environment with network access + torchvision + lpips installed
(this offline container has neither the packages' weights nor egress):

    python tools/export_lpips_npz.py monogs_dev_tpu/eval/lpips_weights.npz

Layout: conv{0..4}_w (O,I,K,K), conv{0..4}_b (O,), lin{0..4}_w (O,) — the
AlexNet features backbone and the LPIPS linear calibration heads.
"""

import sys

import numpy as np


def main(out_path: str) -> None:
    import lpips  # type: ignore
    import torch

    model = lpips.LPIPS(net="alex")  # downloads weights on first use
    alex = model.net  # lpips.pretrained_networks.alexnet wrapper
    convs = [m for m in alex.modules() if isinstance(m, torch.nn.Conv2d)]
    lins = [lin.model[-1] for lin in model.lins]  # Dropout? -> Conv2d(Ci,1,1)
    arrays = {}
    for i, c in enumerate(convs[:5]):
        arrays[f"conv{i}_w"] = c.weight.detach().numpy().astype(np.float32)
        arrays[f"conv{i}_b"] = c.bias.detach().numpy().astype(np.float32)
    for i, l in enumerate(lins[:5]):
        arrays[f"lin{i}_w"] = (
            l.weight.detach().numpy().reshape(-1).astype(np.float32)
        )
    np.savez_compressed(out_path, **arrays)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "lpips_weights.npz")
