"""Import the reference's own torch/numpy modules under sys.modules stubs.

The reference (/root/reference) depends on external OpenMMLab packages
(mmcv/mmdet/mmseg) plus numba/terminaltables, none of which are installed.
Those packages are L0 *external runtime* (SURVEY.md layer map) — they carry
no Nesie math. This module registers minimal-but-faithful stand-ins so the
reference's math-bearing files import unchanged, letting the tests assert
numeric equality between the reference code *actually running* and the
nesie_tpu ports.

Faithful pieces (semantics matter because reference functions call through
them): ``weighted_loss`` / ``weight_reduce_loss`` follow
mmdet.models.losses.utils exactly. Everything else (registries, Hook,
AsciiTable) is inert plumbing.
"""
from __future__ import annotations

import functools
import importlib.util
import sys
import types

import torch
import torch.nn.functional as F

REF_ROOT = "/root/reference"


# ---------------------------------------------------------------- mmdet math
def _reduce_loss(loss, reduction):
    if reduction == "none":
        return loss
    if reduction == "mean":
        return loss.mean()
    if reduction == "sum":
        return loss.sum()
    raise ValueError(reduction)


def weight_reduce_loss(loss, weight=None, reduction="mean", avg_factor=None):
    if weight is not None:
        loss = loss * weight
    if avg_factor is None:
        loss = _reduce_loss(loss, reduction)
    elif reduction == "mean":
        loss = loss.sum() / avg_factor
    elif reduction != "none":
        raise ValueError("avg_factor can not be used with reduction='sum'")
    return loss


def weighted_loss(loss_func):
    @functools.wraps(loss_func)
    def wrapper(pred, target, weight=None, reduction="mean", avg_factor=None,
                **kwargs):
        loss = loss_func(pred, target, **kwargs)
        return weight_reduce_loss(loss, weight, reduction, avg_factor)

    return wrapper


@weighted_loss
def _mse_loss(pred, target):
    return F.mse_loss(pred, target, reduction="none")


@weighted_loss
def _smooth_l1_loss(pred, target, beta=1.0):
    diff = torch.abs(pred - target)
    return torch.where(diff < beta, 0.5 * diff * diff / beta,
                       diff - 0.5 * beta)


class _MSELoss(torch.nn.Module):
    def __init__(self, reduction="mean", loss_weight=1.0):
        super().__init__()
        self.reduction = reduction
        self.loss_weight = loss_weight

    def forward(self, pred, target, weight=None, avg_factor=None,
                reduction_override=None):
        reduction = reduction_override or self.reduction
        return self.loss_weight * _mse_loss(
            pred, target, weight, reduction=reduction, avg_factor=avg_factor)


class _SmoothL1Loss(torch.nn.Module):
    def __init__(self, beta=1.0, reduction="mean", loss_weight=1.0):
        super().__init__()
        self.beta = beta
        self.reduction = reduction
        self.loss_weight = loss_weight

    def forward(self, pred, target, weight=None, avg_factor=None,
                reduction_override=None, **kwargs):
        reduction = reduction_override or self.reduction
        return self.loss_weight * _smooth_l1_loss(
            pred, target, weight, beta=self.beta, reduction=reduction,
            avg_factor=avg_factor)


@weighted_loss
def _l1_loss(pred, target):
    return torch.abs(pred - target)


class _L1Loss(torch.nn.Module):
    def __init__(self, reduction="mean", loss_weight=1.0):
        super().__init__()
        self.reduction = reduction
        self.loss_weight = loss_weight

    def forward(self, pred, target, weight=None, avg_factor=None,
                reduction_override=None, **kwargs):
        reduction = reduction_override or self.reduction
        return self.loss_weight * _l1_loss(
            pred, target, weight, reduction=reduction, avg_factor=avg_factor)


class _CrossEntropyLoss(torch.nn.Module):
    def __init__(self, use_sigmoid=False, use_mask=False, reduction="mean",
                 class_weight=None, loss_weight=1.0):
        super().__init__()
        self.reduction = reduction
        self.loss_weight = loss_weight
        self.class_weight = class_weight

    def forward(self, cls_score, label, weight=None, avg_factor=None,
                reduction_override=None, **kwargs):
        reduction = reduction_override or self.reduction
        class_weight = (cls_score.new_tensor(self.class_weight)
                        if self.class_weight is not None else None)
        if label.shape == cls_score.shape:  # soft (one-hot) labels
            logp = F.log_softmax(cls_score, dim=1)
            loss = -(label * logp).sum(dim=1)
        else:
            loss = F.cross_entropy(cls_score, label, weight=class_weight,
                                   reduction="none")
        return self.loss_weight * weight_reduce_loss(
            loss, weight, reduction, avg_factor)


# --------------------------------------------------------------- mmcv bricks
class _ConvModule(torch.nn.Module):
    """mmcv.cnn.ConvModule stand-in: conv -> norm -> act with mmcv's child
    naming (``conv`` + ``bn``/``gn``) and bias semantics (``'auto'`` ->
    bias iff no norm follows). Faithful for the configs the reference
    uses: Conv1d/Conv2d 1x1, BN1d/BN2d/GN, ReLU."""

    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, conv_cfg=None, norm_cfg=None,
                 act_cfg=dict(type="ReLU"), bias="auto", inplace=True,
                 **kwargs):
        super().__init__()
        ctype = (conv_cfg or {}).get("type", "Conv2d")
        conv_cls = {"Conv1d": torch.nn.Conv1d,
                    "Conv2d": torch.nn.Conv2d}[ctype]
        if bias == "auto":
            bias = norm_cfg is None
        self.conv = conv_cls(in_channels, out_channels, kernel_size,
                             stride=stride, padding=padding, bias=bias)
        self._norm_name = None
        if norm_cfg is not None:
            ntype = norm_cfg["type"]
            if ntype == "GN":
                self._norm_name = "gn"
                self.gn = torch.nn.GroupNorm(norm_cfg["num_groups"],
                                             out_channels)
            else:
                self._norm_name = "bn"
                bn_cls = {"BN1d": torch.nn.BatchNorm1d,
                          "BN2d": torch.nn.BatchNorm2d,
                          "BN": torch.nn.BatchNorm2d}[ntype]
                self.bn = bn_cls(out_channels)
        self._with_act = act_cfg is not None

    def forward(self, x):
        x = self.conv(x)
        if self._norm_name is not None:
            x = getattr(self, self._norm_name)(x)
        if self._with_act:
            x = F.relu(x)
        return x


def _build_conv_layer(cfg, *args, **kwargs):
    ctype = (cfg or {}).get("type", "Conv2d")
    conv_cls = {"Conv1d": torch.nn.Conv1d, "Conv2d": torch.nn.Conv2d}[ctype]
    return conv_cls(*args, **kwargs)


def _build_norm_layer(cfg, num_features):
    """mmcv.cnn.build_norm_layer stand-in -> (name, module)."""
    ntype = cfg["type"]
    if ntype == "GN":
        return "gn", torch.nn.GroupNorm(cfg["num_groups"], num_features)
    bn_cls = {"BN1d": torch.nn.BatchNorm1d, "BN2d": torch.nn.BatchNorm2d,
              "BN": torch.nn.BatchNorm2d}[ntype]
    kwargs = {k: v for k, v in cfg.items() if k in ("momentum", "eps")}
    return "bn", bn_cls(num_features, **kwargs)


def _build_activation_layer(cfg):
    assert cfg["type"] == "ReLU"
    return torch.nn.ReLU(inplace=cfg.get("inplace", False))


def _constant_init(module, val, bias=0):
    if getattr(module, "weight", None) is not None:
        torch.nn.init.constant_(module.weight, val)
    if getattr(module, "bias", None) is not None:
        torch.nn.init.constant_(module.bias, bias)


def _xavier_init(module, gain=1, bias=0, distribution="normal"):
    if distribution == "normal":
        torch.nn.init.xavier_normal_(module.weight, gain=gain)
    else:
        torch.nn.init.xavier_uniform_(module.weight, gain=gain)
    if getattr(module, "bias", None) is not None:
        torch.nn.init.constant_(module.bias, bias)


def _three_nn_torch(target, source):
    """mmcv.ops.three_nn stand-in: 3 nearest ``source`` points per
    ``target`` point, ascending (CUDA kernel semantics; only ``idx`` is
    consumed by the reference quality modules, which recompute distances
    in torch — side_pooling_module.py:224-238)."""
    d = torch.cdist(target.float(), source.float())
    dist, idx = torch.topk(d, 3, dim=-1, largest=False)
    return dist, idx.int()


# ------------------------------------------------------------- inert plumbing
class _Registry:
    def __init__(self):
        self.module_dict = {}

    def register_module(self, *args, **kwargs):
        def deco(cls):
            self.module_dict[cls.__name__] = cls
            return cls

        if args and callable(args[0]):
            return deco(args[0])
        return deco


class _Hook:
    pass


def _get_priority(p):
    return {"HIGHEST": 0, "VERY_HIGH": 10, "HIGH": 30, "ABOVE_NORMAL": 40,
            "NORMAL": 50, "BELOW_NORMAL": 60, "LOW": 70, "VERY_LOW": 90,
            "LOWEST": 100}.get(p, 50)


def _identity_deco(*args, **kwargs):
    if args and callable(args[0]):
        return args[0]

    def deco(f):
        return f

    return deco


def _mod(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


_installed = False


def install_shims():
    """Register mmcv/mmdet/mmseg/numba/terminaltables stand-ins (idempotent).

    Never overwrites a real installed package.
    """
    global _installed
    if _installed:
        return
    _installed = True

    losses_registry = _Registry()
    detectors_registry = _Registry()

    mmcv = _mod("mmcv", is_tuple_of=lambda seq, t: isinstance(seq, tuple)
                and all(isinstance(x, t) for x in seq))
    _mod("mmcv.utils", print_log=lambda msg, logger=None: None)
    class _BaseModule(torch.nn.Module):
        def __init__(self, init_cfg=None, *args, **kwargs):
            super().__init__()
            self.init_cfg = init_cfg

    _mod("mmcv.runner", HOOKS=_Registry(), Hook=_Hook, Priority=dict,
         get_priority=_get_priority, auto_fp16=_identity_deco,
         force_fp32=_identity_deco, BaseModule=_BaseModule)
    _mod("mmcv.parallel", DataContainer=object)
    _mod("mmcv.cnn", ConvModule=_ConvModule,
         normal_init=lambda *a, **k: None,
         build_norm_layer=_build_norm_layer,
         build_activation_layer=_build_activation_layer,
         constant_init=_constant_init,
         xavier_init=_xavier_init)
    _mod("mmcv.cnn.bricks", build_conv_layer=_build_conv_layer)
    _mod("mmcv.ops", three_nn=_three_nn_torch)
    mmcv.utils = sys.modules["mmcv.utils"]
    mmcv.runner = sys.modules["mmcv.runner"]
    mmcv.cnn = sys.modules["mmcv.cnn"]
    mmcv.ops = sys.modules["mmcv.ops"]

    mmdet = _mod("mmdet")
    models = _mod(
        "mmdet.models", DETECTORS=detectors_registry, LOSSES=losses_registry,
        build_backbone=lambda cfg: None, build_head=lambda cfg: None,
        build_neck=lambda cfg: None, build_loss=lambda cfg: None)
    _mod("mmdet.models.builder", LOSSES=losses_registry,
         DETECTORS=detectors_registry, HEADS=_Registry(),
         BACKBONES=_Registry(), NECKS=_Registry())
    _mod("mmdet.models.losses.utils", weighted_loss=weighted_loss,
         weight_reduce_loss=weight_reduce_loss)
    _mod("mmdet.models.losses", MSELoss=_MSELoss, SmoothL1Loss=_SmoothL1Loss,
         L1Loss=_L1Loss, CrossEntropyLoss=_CrossEntropyLoss,
         weighted_loss=weighted_loss)
    sys.modules["mmdet.models.losses"].utils = sys.modules[
        "mmdet.models.losses.utils"]
    _mod("mmdet.models.detectors", BaseDetector=torch.nn.Module)
    _mod("mmdet.core", multi_apply=None, reduce_mean=None)
    mmdet.models = models

    numba = _mod("numba", jit=_identity_deco, njit=_identity_deco)
    numba.errors = _mod(
        "numba.errors",
        NumbaPerformanceWarning=type("NumbaPerformanceWarning",
                                     (Warning,), {}))

    class _AsciiTable:
        def __init__(self, rows, title=None):
            self.rows = rows
            self.inner_footing_row_border = False

        @property
        def table(self):
            return "\n".join(" | ".join(str(c) for c in row)
                             for row in self.rows)

    _mod("terminaltables", AsciiTable=_AsciiTable)


def load_ref(relpath, modname, package_modules=None):
    """Import a reference source file as module ``modname``.

    Args:
        relpath: path under /root/reference, e.g.
            "mmdet3d/models/losses/gfocal_loss.py".
        modname: dotted name to register. If it contains dots, parent
            package entries (with empty __path__) are synthesized so
            relative imports resolve against ``package_modules``.
        package_modules: {relative_name: module} siblings to pre-register,
            e.g. {"single_stage": stub_module}.
    """
    install_shims()
    if modname in sys.modules:
        return sys.modules[modname]
    parts = modname.split(".")
    for i in range(1, len(parts)):
        pkg = ".".join(parts[:i])
        if pkg not in sys.modules:
            m = types.ModuleType(pkg)
            m.__path__ = []
            sys.modules[pkg] = m
    if package_modules:
        pkg = ".".join(parts[:-1])
        for name, mod in package_modules.items():
            sys.modules[f"{pkg}.{name}"] = mod
    spec = importlib.util.spec_from_file_location(
        modname, f"{REF_ROOT}/{relpath}")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[modname] = mod
    spec.loader.exec_module(mod)
    return mod
