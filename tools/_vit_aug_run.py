"""One-off: ViT-S/8 with the augmentation suite enabled (C12 wired), same
32-track recipe as the DESIGN accuracy rows."""
import dataclasses
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from guitar_tablature_classification_tpu.config import to_json
from guitar_tablature_classification_tpu.train.run import build_parser, main, make_config

args = build_parser().parse_args([
    "--synthetic", "--synthetic-tracks", "32", "--arch", "vit_s8",
    "--epochs", "25", "--checkpoint-dir", "/tmp/vit_aug_ckpt2",
])
cfg = make_config(args)
cfg = dataclasses.replace(cfg, optim=dataclasses.replace(cfg.optim, augment=True))
with open("/tmp/vit_aug_cfg.json", "w") as f:
    f.write(to_json(cfg))
raise SystemExit(main([
    "--synthetic", "--synthetic-tracks", "32", "--config", "/tmp/vit_aug_cfg.json",
    "--checkpoint-dir", "/tmp/vit_aug_ckpt2",
]))
