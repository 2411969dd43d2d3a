"""XLA cost analysis of the eval forward + semi step at production scale.

Source of the FLOP/byte numbers in docs/DESIGN.md "MFU / roofline
accounting". Compiles (never runs) both programs on the CPU backend and
prints cost_analysis() totals:

    python tools/flops_analysis.py
"""
import os
os.environ.setdefault("XLA_FLAGS", "")
import jax; jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import json, sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from nesie_tpu.config import get_config
from nesie_tpu.train import runner
from nesie_tpu.train.step import make_eval_forward

cfg = get_config("nesie-votenet-scannet-train-010")
model = runner.build_model(cfg)
state, tx = runner.init_state(cfg, model, steps_per_epoch=100)

B, N = 8, 40000
pts = jnp.zeros((B, N, 4))
fwd = make_eval_forward(model, "seed")
lowered = jax.jit(lambda s, p, r: fwd(s, p, r)).lower(state, pts, jax.random.PRNGKey(0))
comp = lowered.compile()
ca = comp.cost_analysis()
if isinstance(ca, list): ca = ca[0]
print(json.dumps({"eval_forward_B8": {k: ca.get(k) for k in ("flops", "bytes accessed", "transcendentals")}}))

# semi step at 4+8
from nesie_tpu.train.semi import UlbState, make_semi_train_step
from nesie_tpu.data.augment import AugParams
import numpy as np
nl, nu = 4, 8
Bt = nl + nu
step = make_semi_train_step(model, tx, n_labeled=nl, num_labeled_scans=120,
                            loss_cfg=cfg.loss, pl_cfg=cfg.pseudo,
                            sample_mod=cfg.sample_mod_train)
ulb = UlbState.create(1200, cfg.model.num_classes)
aug = AugParams.identity((Bt,))
batch = dict(
    points_raw_s=jnp.zeros((Bt, N, 4)),
    points_raw_t=jnp.zeros((Bt, N, 4)),
    gt_boxes=jnp.zeros((Bt, 64, 7)),
    gt_labels=jnp.zeros((Bt, 64), jnp.int32),
    gt_valid=jnp.zeros((Bt, 64), bool),
    aug_s=aug, aug_t=aug,
    ulb_scan_idx=jnp.zeros((Bt,), jnp.int32),
)
lowered = jax.jit(step).lower(state, ulb, batch, jax.random.PRNGKey(0))
comp = lowered.compile()
ca = comp.cost_analysis()
if isinstance(ca, list): ca = ca[0]
print(json.dumps({"semi_step_4p8": {k: ca.get(k) for k in ("flops", "bytes accessed", "transcendentals")}}))
