"""Checkpoint-converter structure test: a synthesized reference-style
state_dict converts into pytrees that exactly match the flax model's
param/batch_stats structure and shapes."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nesie_tpu.convert_torch import convert_state_dict, extract_ema
from nesie_tpu.nn.detector import VoteNetNesie


def _synth_state_dict():
    """Build a torch-style state_dict with the reference's key naming for
    the flagship Nesie architecture (shapes mirror the real config)."""
    sd = {}
    r = np.random.RandomState(0)

    def bn_stats(prefix, cout):
        sd[f"{prefix}.weight"] = r.randn(cout).astype(np.float32)
        sd[f"{prefix}.bias"] = r.randn(cout).astype(np.float32)
        sd[f"{prefix}.running_mean"] = r.randn(cout).astype(np.float32)
        sd[f"{prefix}.running_var"] = np.abs(r.randn(cout)).astype(np.float32) + 0.1

    def conv(name, cin, cout, bias=True, bn=True):
        sd[f"{name}.conv.weight"] = r.randn(cout, cin, 1, 1).astype(np.float32)
        if bias:
            sd[f"{name}.conv.bias"] = r.randn(cout).astype(np.float32)
        if bn:
            bn_stats(f"{name}.bn", cout)

    # backbone: 4 SA + 2 FP
    sa_specs = [
        (1 + 3, (64, 64, 128)),
        (128 + 3, (128, 128, 256)),
        (256 + 3, (128, 128, 256)),
        (256 + 3, (128, 128, 256)),
    ]
    for i, (cin, chans) in enumerate(sa_specs):
        prev = cin
        for j, c in enumerate(chans):
            conv(f"backbone.SA_modules.{i}.mlps.0.layer{j}", prev, c, bias=False)
            prev = c
    fp_specs = [(256 + 256, (256, 256)), (256 + 256, (256, 256))]
    for i, (cin, chans) in enumerate(fp_specs):
        prev = cin
        for j, c in enumerate(chans):
            conv(f"backbone.FP_modules.{i}.mlps.layer{j}", prev, c, bias=False)
            prev = c

    # vote module
    for j, (cin, c) in enumerate([(256, 256), (256, 256)]):
        conv(f"bbox_head.vote_module.vote_conv.{j}", cin, c)
    sd["bbox_head.vote_module.conv_out.weight"] = r.randn(259, 256, 1).astype(np.float32)
    sd["bbox_head.vote_module.conv_out.bias"] = r.randn(259).astype(np.float32)

    # aggregation
    prev = 256 + 3
    for j, c in enumerate((128, 128, 128)):
        conv(f"bbox_head.vote_aggregation.mlps.0.layer{j}", prev, c, bias=False)
        prev = c

    # conv_pred
    for j in range(2):
        conv(f"bbox_head.conv_pred.shared_convs.layer{j}", 128, 128)
    for name, cout in (("conv_cls", 20), ("conv_bbox", 198), ("conv_heading", 2)):
        sd[f"bbox_head.conv_pred.{name}.weight"] = r.randn(cout, 128, 1).astype(np.float32)
        sd[f"bbox_head.conv_pred.{name}.bias"] = r.randn(cout).astype(np.float32)

    # quality module: 7 MiniPointNets + 7 heads
    def mini(prefix, cin):
        sd[f"{prefix}.first_conv.0.weight"] = r.randn(256, cin, 1, 1).astype(np.float32)
        bn_stats(f"{prefix}.first_conv.1", 256)
        sd[f"{prefix}.first_conv.3.weight"] = r.randn(128, 256, 1, 1).astype(np.float32)
        sd[f"{prefix}.first_conv.3.bias"] = r.randn(128).astype(np.float32)
        sd[f"{prefix}.second_conv.0.weight"] = r.randn(256, 256, 1, 1).astype(np.float32)
        bn_stats(f"{prefix}.second_conv.1", 256)
        sd[f"{prefix}.second_conv.3.weight"] = r.randn(128, 256, 1, 1).astype(np.float32)
        sd[f"{prefix}.second_conv.3.bias"] = r.randn(128).astype(np.float32)

    for i in range(7):
        mini(f"bbox_head.grid_conv.mlps_before.{i}", 256 + 3)

    def head(prefix, cin, cout):
        sd[f"{prefix}.0.weight"] = r.randn(128, cin, 1).astype(np.float32)
        sd[f"{prefix}.0.bias"] = r.randn(128).astype(np.float32)
        bn_stats(f"{prefix}.1", 128)
        sd[f"{prefix}.3.weight"] = r.randn(128, 128, 1).astype(np.float32)
        sd[f"{prefix}.3.bias"] = r.randn(128).astype(np.float32)
        bn_stats(f"{prefix}.4", 128)
        sd[f"{prefix}.6.weight"] = r.randn(cout, 128, 1).astype(np.float32)
        sd[f"{prefix}.6.bias"] = r.randn(cout).astype(np.float32)

    for i in range(6):
        head(f"bbox_head.grid_conv.mlps_head.{i}", 128 + 33 + 4 + 1, 18)
    head("bbox_head.grid_conv.mlps_head.6", 128, 18)
    return sd


def _tree_shapes(t):
    return jax.tree.map(lambda x: tuple(np.shape(x)), t)


def test_converted_structure_matches_flax_model():
    import jax.numpy as jnp

    sd = _synth_state_dict()
    params, stats = convert_state_dict(sd)

    model = VoteNetNesie()
    rng = jax.random.PRNGKey(0)
    pts = jax.random.uniform(rng, (1, 2048, 4))
    variables = model.init({"params": rng}, pts, "vote", rng, train=False)

    import jax.tree_util as jtu

    def flat(t):
        return {jtu.keystr(k): v for k, v in jtu.tree_leaves_with_path(t)}

    assert flat(_tree_shapes(params)) == flat(_tree_shapes(variables["params"]))
    assert flat(_tree_shapes(stats)) == flat(
        _tree_shapes(variables["batch_stats"])
    )

    # converted weights actually run
    out = model.apply(
        {"params": jax.tree.map(jnp.asarray, params),
         "batch_stats": jax.tree.map(jnp.asarray, stats)},
        pts, "vote", rng, train=False,
    )
    assert np.isfinite(np.asarray(out["bbox_preds"])).all()


def test_extract_ema():
    sd = {"backbone.x.weight": 1, "ema_backbone_x_weight": 2}
    ema = extract_ema(sd)
    assert ema == {"backbone.x.weight": 2}


def test_convmodule_chain_numeric_parity():
    """NUMERIC converter validation: a real torch Conv1d(1x1)+BN1d+ReLU
    stack (the mmcv ConvModule pattern every reference module is built
    from) and our PointMLP must produce identical outputs after
    _convmodule_chain weight mapping — proving the (out,in,1)->(in,out)
    kernel transpose and BN stat mapping numerically, not just
    structurally."""
    import torch

    import jax
    from nesie_tpu.convert_torch import _convmodule_chain
    from nesie_tpu.nn.layers import PointMLP

    torch.manual_seed(0)
    layers = []
    dims = [5, 8, 6]
    for i in range(len(dims) - 1):
        conv = torch.nn.Conv1d(dims[i], dims[i + 1], 1, bias=False)
        bn = torch.nn.BatchNorm1d(dims[i + 1], eps=1e-5)
        # nontrivial running stats + affine
        with torch.no_grad():
            bn.running_mean.uniform_(-0.5, 0.5)
            bn.running_var.uniform_(0.5, 2.0)
            bn.weight.uniform_(0.5, 1.5)
            bn.bias.uniform_(-0.3, 0.3)
        layers.append((conv, bn))

    x = torch.randn(2, dims[0], 7)
    with torch.no_grad():
        y = x
        for conv, bn in layers:
            bn.eval()
            y = torch.relu(bn(conv(y)))
    want = y.permute(0, 2, 1).numpy()  # channels-last

    # mmcv ConvModule naming: <prefix>.layer{j}.conv/bn
    sd = {}
    for j, (conv, bn) in enumerate(layers):
        sd[f"mlp.layer{j}.conv.weight"] = conv.weight.detach().numpy()
        sd[f"mlp.layer{j}.bn.weight"] = bn.weight.detach().numpy()
        sd[f"mlp.layer{j}.bn.bias"] = bn.bias.detach().numpy()
        sd[f"mlp.layer{j}.bn.running_mean"] = bn.running_mean.numpy()
        sd[f"mlp.layer{j}.bn.running_var"] = bn.running_var.numpy()

    params, stats = {}, {}
    _convmodule_chain(sd, "mlp", 2, params, stats)

    model = PointMLP((8, 6))
    got = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x.permute(0, 2, 1).numpy()),
        train=False,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)
