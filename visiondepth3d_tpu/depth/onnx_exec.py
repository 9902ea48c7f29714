"""Arbitrary-ONNX execution on TPU: a minimal graph interpreter over JAX.

The reference runs any ``[Local]`` folder containing a ``model.onnx``
directly through onnxruntime (render_depth.py:716-724,832-954). The TPU
build's first-class path is Flax ports + converted weights, but a user's
unrecognized ONNX depth model still needs to RUN — this module walks the
graph (parsed dependency-free by utils/onnx_reader.read_onnx_graph) and
maps each node onto jax/lax ops, producing one jit-compiled function.

Design notes (TPU-first):
- the interpreter runs at TRACE time: every "shape tensor" op (Shape,
  Constant, int arithmetic feeding Reshape/Resize/Slice) is evaluated
  eagerly on host numpy, so the traced graph has static shapes — XLA sees
  an ordinary static network, exactly like a hand-written Flax port;
- data tensors stay NCHW as exported; XLA's layout assignment handles the
  TPU-preferred layouts, so there is no transpose tax for running the
  ONNX convention;
- unsupported ops fail LOUDLY with the op name and the supported
  conversion path (the reference silently falls back CPU; we refuse with
  an actionable message instead).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..utils.onnx_reader import read_onnx_graph


class OnnxUnsupportedOp(NotImplementedError):
    pass


def _is_host(*vals) -> bool:
    return all(isinstance(v, np.ndarray) or np.isscalar(v) for v in vals)


# ops evaluated on host numpy when ALL inputs are host values (shape math)
_HOST_SET = {
    "Add", "Sub", "Mul", "Div", "Concat", "Gather", "Slice", "Squeeze",
    "Unsqueeze", "Cast", "Range", "Where", "Equal", "Greater", "Less",
    "Shape", "Constant", "ConstantOfShape", "Reshape", "Expand", "Floor",
    "Ceil", "Min", "Max", "ReduceProd", "Identity",
}

_ONNX_DTYPES = {
    1: jnp.float32, 2: jnp.uint8, 3: jnp.int8, 6: jnp.int32, 7: jnp.int64,
    9: jnp.bool_, 10: jnp.float16, 11: jnp.float64, 16: jnp.bfloat16,
}


def _auto_pads(attrs, kernel_hw, strides, in_hw, dilations=(1, 1)):
    """-> [(lo, hi), (lo, hi)] spatial padding from pads/auto_pad attrs."""
    auto = attrs.get("auto_pad", b"NOTSET")
    auto = auto.decode() if isinstance(auto, bytes) else auto
    if auto in ("SAME_UPPER", "SAME_LOWER"):
        out = []
        for i in range(2):
            eff_k = (kernel_hw[i] - 1) * dilations[i] + 1
            osz = -(-in_hw[i] // strides[i])
            total = max(0, (osz - 1) * strides[i] + eff_k - in_hw[i])
            lo = total // 2 if auto == "SAME_UPPER" else total - total // 2
            out.append((lo, total - lo))
        return out
    pads = attrs.get("pads", [0, 0, 0, 0])
    n = len(pads) // 2
    return [(int(pads[i]), int(pads[i + n])) for i in range(n)]


# input positions that must be trace-time static (shape parameters)
_STATIC_ARGS = {
    "Reshape": (1,), "Resize": (1, 2, 3), "Upsample": (1,),
    "Slice": (1, 2, 3, 4), "Expand": (1,), "Tile": (1,),
    "ConstantOfShape": (0,), "Pad": (1,), "Split": (1,),
    "Unsqueeze": (1,), "Squeeze": (1,), "Range": (0, 1, 2),
}


class OnnxExecutor:
    """Executes a parsed ONNX graph as one jittable function.

    ``run(params, feeds)`` takes the initializer dict as a pytree argument
    (device-resident, donated-friendly) and a feed dict of input arrays.
    Values feeding shape positions (Reshape targets, Resize scales, Slice
    bounds, ...) are resolved from the STATIC initializer table, never
    from traced params — the whole shape subgraph folds at trace time so
    XLA compiles a static network.
    """

    def __init__(self, path_or_graph):
        g = (path_or_graph if isinstance(path_or_graph, dict)
             else read_onnx_graph(path_or_graph))
        self.graph = g
        self.inputs = g["inputs"]
        self.output_names = [n for n, _ in g["outputs"]]
        self.initializers = g["initializers"]
        # ops present but unimplemented fail at build, not at call time
        missing = sorted({n["op"] for n in g["nodes"]}
                         - set(_DISPATCH) - {"Constant"})
        if missing:
            raise OnnxUnsupportedOp(
                f"ONNX graph uses unsupported op(s) {missing}. The TPU "
                f"executor covers the conv/ViT depth-model op set; for a "
                f"known architecture convert the checkpoint instead "
                f"(`vd3d convert --model <family>`; families: "
                f"`vd3d models`).")
        self._static_names = self._static_closure(g["nodes"])

    @staticmethod
    def _static_closure(nodes) -> set:
        """Names that must stay host-static: backward closure from every
        shape-parameter input position."""
        static: set = set()
        for node in nodes:
            for pos in _STATIC_ARGS.get(node["op"], ()):
                if pos < len(node["inputs"]) and node["inputs"][pos]:
                    static.add(node["inputs"][pos])
        changed = True
        while changed:
            changed = False
            for node in nodes:
                if any(o in static for o in node["outputs"]):
                    for i in node["inputs"]:
                        if i and i not in static:
                            static.add(i)
                            changed = True
        return static

    def run(self, params: dict, feeds: dict):
        env: dict[str, object] = {}
        for k, v in params.items():
            env[k] = v
        # shape-subgraph constants bypass the (possibly traced) params
        for k in self._static_names & set(self.initializers):
            env[k] = self.initializers[k]
        for k, v in feeds.items():
            env[k] = v
        for node in self.graph["nodes"]:
            op = node["op"]
            fn = _DISPATCH.get(op)
            if fn is None:
                raise OnnxUnsupportedOp(
                    f"node {node['name']!r}: op {op!r} unsupported")
            args = [env[i] if i else None for i in node["inputs"]]
            if op in _HOST_SET and _is_host(*(a for a in args
                                              if a is not None)):
                out = fn(node, args, host=True)
            else:
                out = fn(node, args, host=False)
            if not isinstance(out, (list, tuple)):
                out = [out]
            for name, val in zip(node["outputs"], out):
                if name:
                    env[name] = val
        return [env[n] for n in self.output_names]


# --- op implementations ----------------------------------------------------

def _xp(host):
    return np if host else jnp


def _const_int(v, what):
    """Shape parameters must be host-static (trace-time) values."""
    if isinstance(v, np.ndarray) or np.isscalar(v):
        return np.asarray(v)
    raise OnnxUnsupportedOp(
        f"{what} depends on a data-driven (traced) shape — the TPU "
        "executor requires static shapes (XLA compilation model)")


def _ew(fn_j, fn_n=None):
    def impl(node, a, host):
        f = (fn_n or fn_j) if host else fn_j
        return f(*[x for x in a if x is not None])
    return impl


def _conv(node, a, host):
    x, w = a[0], a[1]
    b = a[2] if len(a) > 2 else None
    attrs = node["attrs"]
    strides = tuple(attrs.get("strides", [1] * (x.ndim - 2)))
    dil = tuple(attrs.get("dilations", [1] * (x.ndim - 2)))
    groups = int(attrs.get("group", 1))
    if x.ndim != 4:
        raise OnnxUnsupportedOp(f"Conv rank {x.ndim} (only 2-D convs)")
    pads = _auto_pads(attrs, w.shape[2:], strides, x.shape[2:], dil)
    y = lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), strides, pads,
        rhs_dilation=dil, feature_group_count=groups,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    if b is not None:
        y = y + jnp.asarray(b).reshape(1, -1, 1, 1)
    return y


def _conv_transpose(node, a, host):
    x, w = jnp.asarray(a[0]), jnp.asarray(a[1])
    b = a[2] if len(a) > 2 else None
    attrs = node["attrs"]
    strides = tuple(attrs.get("strides", [1, 1]))
    pads = attrs.get("pads", [0, 0, 0, 0])
    out_pad = attrs.get("output_padding", [0, 0])
    groups = int(attrs.get("group", 1))
    if groups != 1:
        raise OnnxUnsupportedOp("grouped ConvTranspose")
    # ONNX ConvTranspose(x, W[I,O,kh,kw]) == input-dilated conv with the
    # spatially-flipped kernel transposed to OIHW, padding k-1-p
    kh, kw = w.shape[2], w.shape[3]
    w_oihw = jnp.flip(w, axis=(2, 3)).transpose(1, 0, 2, 3)
    pad_h = (kh - 1 - int(pads[0]), kh - 1 - int(pads[2]) + int(out_pad[0]))
    pad_w = (kw - 1 - int(pads[1]), kw - 1 - int(pads[3]) + int(out_pad[1]))
    y = lax.conv_general_dilated(
        x, w_oihw, (1, 1), [pad_h, pad_w], lhs_dilation=strides,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    if b is not None:
        y = y + jnp.asarray(b).reshape(1, -1, 1, 1)
    return y


def _gemm(node, a, host):
    x, w = jnp.asarray(a[0]), jnp.asarray(a[1])
    attrs = node["attrs"]
    if int(attrs.get("transA", 0)):
        x = x.T
    if int(attrs.get("transB", 0)):
        w = w.T
    y = float(attrs.get("alpha", 1.0)) * (x @ w)
    if len(a) > 2 and a[2] is not None:
        y = y + float(attrs.get("beta", 1.0)) * jnp.asarray(a[2])
    return y


def _pool(reducer, init, avg):
    def impl(node, a, host):
        x = jnp.asarray(a[0])
        attrs = node["attrs"]
        k = tuple(attrs.get("kernel_shape"))
        strides = tuple(attrs.get("strides", [1] * len(k)))
        pads = _auto_pads(attrs, k, strides, x.shape[2:])
        if int(attrs.get("ceil_mode", 0)):
            # extend the upper pad so the last partial window is included
            pads = [
                (lo, hi + s - 1) for (lo, hi), s in zip(pads, strides)
            ]
        window = (1, 1) + k
        strd = (1, 1) + strides
        pad4 = [(0, 0), (0, 0)] + pads
        y = lax.reduce_window(x, init, reducer, window, strd, pad4)
        if avg:
            if int(node["attrs"].get("count_include_pad", 0)):
                y = y / float(np.prod(k))
            else:
                ones = jnp.ones(x.shape[2:], x.dtype)[None, None]
                cnt = lax.reduce_window(ones, 0.0, lax.add, window, strd,
                                        pad4)
                y = y / cnt
        return y
    return impl


def _batchnorm(node, a, host):
    x, scale, bias, mean, var = (jnp.asarray(v) for v in a[:5])
    eps = float(node["attrs"].get("epsilon", 1e-5))
    shape = (1, -1) + (1,) * (x.ndim - 2)
    return (x - mean.reshape(shape)) * (
        scale.reshape(shape) * lax.rsqrt(var.reshape(shape) + eps)
    ) + bias.reshape(shape)


def _instancenorm(node, a, host):
    x, scale, bias = (jnp.asarray(v) for v in a[:3])
    eps = float(node["attrs"].get("epsilon", 1e-5))
    axes = tuple(range(2, x.ndim))
    mu = x.mean(axis=axes, keepdims=True)
    var = x.var(axis=axes, keepdims=True)
    shape = (1, -1) + (1,) * (x.ndim - 2)
    return (x - mu) * lax.rsqrt(var + eps) * scale.reshape(shape) \
        + bias.reshape(shape)


def _layernorm(node, a, host):
    x = jnp.asarray(a[0])
    scale = jnp.asarray(a[1])
    bias = jnp.asarray(a[2]) if len(a) > 2 and a[2] is not None else None
    attrs = node["attrs"]
    axis = int(attrs.get("axis", -1))
    eps = float(attrs.get("epsilon", 1e-5))
    axes = tuple(range(axis % x.ndim, x.ndim))
    mu = x.mean(axis=axes, keepdims=True)
    var = x.var(axis=axes, keepdims=True)
    y = (x - mu) * lax.rsqrt(var + eps) * scale
    return y + bias if bias is not None else y


def _softmax(node, a, host):
    axis = int(node["attrs"].get("axis", -1))
    return jax.nn.softmax(jnp.asarray(a[0]), axis=axis)


def _reshape(node, a, host):
    shape = _const_int(a[1], "Reshape target").astype(np.int64).tolist()
    x = a[0]
    cur = list(np.shape(x))
    out = []
    for i, s in enumerate(shape):
        if s == 0 and not int(node["attrs"].get("allowzero", 0)):
            out.append(cur[i])
        else:
            out.append(int(s))
    xp = _xp(host)
    return xp.reshape(x, out)


def _transpose(node, a, host):
    perm = node["attrs"].get("perm")
    xp = _xp(host)
    return xp.transpose(a[0], perm)


def _concat(node, a, host):
    axis = int(node["attrs"].get("axis", 0))
    xp = _xp(host)
    return xp.concatenate([v for v in a if v is not None], axis=axis)


def _gather(node, a, host):
    axis = int(node["attrs"].get("axis", 0))
    xp = _xp(host)
    return xp.take(a[0], _const_int(a[1], "Gather indices")
                   if host else a[1], axis=axis)


def _axes_arg(node, a, idx):
    if len(a) > idx and a[idx] is not None:
        return _const_int(a[idx], "axes").astype(np.int64).ravel().tolist()
    ax = node["attrs"].get("axes")
    return list(ax) if ax is not None else None


def _unsqueeze(node, a, host):
    axes = _axes_arg(node, a, 1) or []
    x = a[0]
    xp = _xp(host)
    out_rank = np.ndim(x) + len(axes)
    for ax in sorted(ax % out_rank for ax in axes):
        x = xp.expand_dims(x, ax)
    return x


def _squeeze(node, a, host):
    axes = _axes_arg(node, a, 1)
    xp = _xp(host)
    if axes is None:
        return xp.squeeze(a[0])
    return xp.squeeze(a[0], axis=tuple(ax % np.ndim(a[0]) for ax in axes))


def _slice(node, a, host):
    x = a[0]
    rank = np.ndim(x)
    if len(a) > 1:  # opset >= 10: inputs
        starts = _const_int(a[1], "Slice starts").ravel().tolist()
        ends = _const_int(a[2], "Slice ends").ravel().tolist()
        axes = (_const_int(a[3], "Slice axes").ravel().tolist()
                if len(a) > 3 and a[3] is not None else list(range(rank)))
        steps = (_const_int(a[4], "Slice steps").ravel().tolist()
                 if len(a) > 4 and a[4] is not None else [1] * len(starts))
    else:  # opset 1 attrs
        starts = list(node["attrs"].get("starts"))
        ends = list(node["attrs"].get("ends"))
        axes = list(node["attrs"].get("axes", range(rank)))
        steps = [1] * len(starts)
    sl = [slice(None)] * rank
    for s, e, ax, st in zip(starts, ends, axes, steps):
        big = 1 << 62
        s = None if s in (-big, big) else int(s)
        e = None if (e is not None and abs(int(e)) >= big) else int(e)
        sl[int(ax) % rank] = slice(s, e, int(st))
    return a[0][tuple(sl)]


def _cast(node, a, host):
    to = _ONNX_DTYPES.get(int(node["attrs"].get("to", 1)), jnp.float32)
    if host:
        return np.asarray(a[0]).astype(np.dtype(to.dtype.name if hasattr(
            to, "dtype") else to))
    return jnp.asarray(a[0]).astype(to)


def _reduce(jnp_fn, np_fn):
    def impl(node, a, host):
        axes = _axes_arg(node, a, 1)
        keep = bool(int(node["attrs"].get("keepdims", 1)))
        xp_fn = np_fn if host else jnp_fn
        return xp_fn(a[0], axis=tuple(axes) if axes else None,
                     keepdims=keep)
    return impl


def _resize(node, a, host):
    x = jnp.asarray(a[0])
    attrs = node["attrs"]
    mode = attrs.get("mode", b"nearest")
    mode = mode.decode() if isinstance(mode, bytes) else mode
    ctm = attrs.get("coordinate_transformation_mode", b"half_pixel")
    ctm = ctm.decode() if isinstance(ctm, bytes) else ctm
    sizes = scales = None
    if len(a) > 3 and a[3] is not None and np.size(
            _const_int(a[3], "Resize sizes")):
        sizes = _const_int(a[3], "Resize sizes").ravel().astype(int).tolist()
    elif len(a) > 2 and a[2] is not None and np.size(
            _const_int(a[2], "Resize scales")):
        scales = _const_int(a[2], "Resize scales").ravel().tolist()
    elif len(a) > 1 and a[1] is not None and np.size(a[1]):  # Upsample v9
        scales = _const_int(a[1], "Upsample scales").ravel().tolist()
    if sizes is None:
        sizes = [int(round(d * s)) for d, s in zip(x.shape, scales)]
    method = {"nearest": "nearest", "linear": "bilinear",
              "cubic": "bicubic"}.get(mode)
    if method is None:
        raise OnnxUnsupportedOp(f"Resize mode {mode!r}")
    if method != "nearest" and ctm == "align_corners":
        # jax.image has no align_corners; build the index map manually
        return _resize_align_corners(x, sizes)
    return jax.image.resize(x, tuple(sizes), method=method)


def _resize_align_corners(x, sizes):
    out = x
    for ax in range(x.ndim):
        n_in, n_out = x.shape[ax], sizes[ax]
        if n_in == n_out:
            continue
        if n_out == 1 or n_in == 1:
            idx = jnp.zeros((n_out,), jnp.float32)
        else:
            idx = jnp.linspace(0.0, n_in - 1.0, n_out)
        lo = jnp.clip(jnp.floor(idx).astype(jnp.int32), 0, n_in - 1)
        hi = jnp.clip(lo + 1, 0, n_in - 1)
        w = (idx - lo).astype(x.dtype)
        shape = [1] * out.ndim
        shape[ax] = n_out
        wb = w.reshape(shape)
        out = (jnp.take(out, lo, axis=ax) * (1 - wb)
               + jnp.take(out, hi, axis=ax) * wb)
    return out


def _pad(node, a, host):
    x = jnp.asarray(a[0])
    attrs = node["attrs"]
    mode = attrs.get("mode", b"constant")
    mode = mode.decode() if isinstance(mode, bytes) else mode
    if len(a) > 1 and a[1] is not None:
        pads = _const_int(a[1], "Pad pads").ravel().astype(int).tolist()
    else:
        pads = list(attrs.get("pads"))
    n = len(pads) // 2
    widths = [(pads[i], pads[i + n]) for i in range(n)]
    cval = 0.0
    if len(a) > 2 and a[2] is not None:
        cval = float(np.asarray(a[2]).ravel()[0])
    jmode = {"constant": "constant", "reflect": "reflect",
             "edge": "edge"}.get(mode)
    if jmode is None:
        raise OnnxUnsupportedOp(f"Pad mode {mode!r}")
    if jmode == "constant":
        return jnp.pad(x, widths, mode=jmode, constant_values=cval)
    return jnp.pad(x, widths, mode=jmode)


def _split(node, a, host):
    x = a[0]
    axis = int(node["attrs"].get("axis", 0))
    if len(a) > 1 and a[1] is not None:
        split = _const_int(a[1], "Split sizes").ravel().astype(int).tolist()
    else:
        split = node["attrs"].get("split")
    if split is None:
        n_out = len(node["outputs"])
        split = [x.shape[axis] // n_out] * n_out
    idx = np.cumsum(split)[:-1].tolist()
    xp = _xp(host)
    return list(xp.split(x, idx, axis=axis))


def _expand(node, a, host):
    shape = _const_int(a[1], "Expand shape").ravel().astype(int).tolist()
    xp = _xp(host)
    tgt = list(shape)
    cur = list(np.shape(a[0]))
    # onnx Expand uses bidirectional broadcast; max() per dim
    while len(cur) < len(tgt):
        cur.insert(0, 1)
    out = [max(c, t) if t != 1 else c for c, t in zip(cur, tgt)]
    return xp.broadcast_to(a[0], out)


def _constant(node, a, host):
    val = node["attrs"].get("value")
    if val is None:
        for k in ("value_float", "value_int"):
            if k in node["attrs"]:
                return np.asarray(node["attrs"][k])
        raise OnnxUnsupportedOp("Constant without value")
    return np.asarray(val)


def _constant_of_shape(node, a, host):
    shape = _const_int(a[0], "ConstantOfShape").ravel().astype(int).tolist()
    val = node["attrs"].get("value")
    v = np.asarray(val).ravel()[0] if val is not None else np.float32(0)
    return np.full(shape, v)


def _shape_op(node, a, host):
    return np.asarray(np.shape(a[0]), np.int64)


def _clip(node, a, host):
    lo = hi = None
    if len(a) > 1 and a[1] is not None:
        lo = np.asarray(a[1]) if _is_host(a[1]) else a[1]
    else:
        lo = node["attrs"].get("min")
    if len(a) > 2 and a[2] is not None:
        hi = np.asarray(a[2]) if _is_host(a[2]) else a[2]
    else:
        hi = node["attrs"].get("max")
    return jnp.clip(jnp.asarray(a[0]), lo, hi)


def _leaky(node, a, host):
    alpha = float(node["attrs"].get("alpha", 0.01))
    x = jnp.asarray(a[0])
    return jnp.where(x >= 0, x, alpha * x)


def _prelu(node, a, host):
    x, slope = jnp.asarray(a[0]), jnp.asarray(a[1])
    if slope.ndim == 1 and x.ndim == 4:
        slope = slope.reshape(1, -1, 1, 1)
    return jnp.where(x >= 0, x, slope * x)


def _range(node, a, host):
    s, e, d = (np.asarray(v).ravel()[0] for v in a[:3])
    return np.arange(s, e, d)


def _matmul(node, a, host):
    return jnp.matmul(jnp.asarray(a[0]), jnp.asarray(a[1]))


def _where(node, a, host):
    xp = _xp(host)
    return xp.where(a[0], a[1], a[2])


def _tile(node, a, host):
    reps = _const_int(a[1], "Tile repeats").ravel().astype(int).tolist()
    xp = _xp(host)
    return xp.tile(a[0], reps)


def _flatten(node, a, host):
    axis = int(node["attrs"].get("axis", 1))
    shape = np.shape(a[0])
    xp = _xp(host)
    return xp.reshape(a[0], (int(np.prod(shape[:axis]) or 1), -1))


def _gelu(node, a, host):
    approx = node["attrs"].get("approximate", b"none")
    approx = approx.decode() if isinstance(approx, bytes) else approx
    return jax.nn.gelu(jnp.asarray(a[0]), approximate=approx == "tanh")


def _einsum(node, a, host):
    eq = node["attrs"].get("equation")
    eq = eq.decode() if isinstance(eq, bytes) else eq
    return jnp.einsum(eq, *[jnp.asarray(v) for v in a if v is not None])


_DISPATCH = {
    "Conv": _conv,
    "ConvTranspose": _conv_transpose,
    "Gemm": _gemm,
    "MatMul": _matmul,
    "Einsum": _einsum,
    "Add": _ew(jnp.add, np.add),
    "Sub": _ew(jnp.subtract, np.subtract),
    "Mul": _ew(jnp.multiply, np.multiply),
    "Div": _ew(jnp.divide, np.divide),
    "Pow": _ew(jnp.power, np.power),
    "Sqrt": _ew(jnp.sqrt, np.sqrt),
    "Exp": _ew(jnp.exp, np.exp),
    "Log": _ew(jnp.log, np.log),
    "Abs": _ew(jnp.abs, np.abs),
    "Neg": _ew(jnp.negative, np.negative),
    "Floor": _ew(jnp.floor, np.floor),
    "Ceil": _ew(jnp.ceil, np.ceil),
    "Min": _ew(jnp.minimum, np.minimum),
    "Max": _ew(jnp.maximum, np.maximum),
    "Reciprocal": _ew(lambda x: 1.0 / x),
    "Erf": _ew(jax.scipy.special.erf),
    "Relu": _ew(jax.nn.relu),
    "LeakyRelu": _leaky,
    "PRelu": _prelu,
    "Elu": _ew(jax.nn.elu),
    "Sigmoid": _ew(jax.nn.sigmoid),
    "HardSigmoid": _ew(lambda x: jnp.clip(x / 6.0 + 0.5, 0, 1)),
    "HardSwish": _ew(lambda x: x * jnp.clip(x / 6.0 + 0.5, 0, 1)),
    "Tanh": _ew(jnp.tanh, np.tanh),
    "Gelu": _gelu,
    "Softmax": _softmax,
    "Softplus": _ew(jax.nn.softplus),
    "Clip": _clip,
    "Equal": _ew(jnp.equal, np.equal),
    "Greater": _ew(jnp.greater, np.greater),
    "Less": _ew(jnp.less, np.less),
    "Not": _ew(jnp.logical_not, np.logical_not),
    "And": _ew(jnp.logical_and, np.logical_and),
    "Or": _ew(jnp.logical_or, np.logical_or),
    "Where": _where,
    "Shape": _shape_op,
    "Constant": _constant,
    "ConstantOfShape": _constant_of_shape,
    "Range": _range,
    "Reshape": _reshape,
    "Transpose": _transpose,
    "Concat": _concat,
    "Gather": _gather,
    "Slice": _slice,
    "Squeeze": _squeeze,
    "Unsqueeze": _unsqueeze,
    "Expand": _expand,
    "Flatten": _flatten,
    "Tile": _tile,
    "Cast": _cast,
    "Identity": lambda node, a, host: a[0],
    "Dropout": lambda node, a, host: a[0],
    "ReduceMean": _reduce(jnp.mean, np.mean),
    "ReduceSum": _reduce(jnp.sum, np.sum),
    "ReduceMax": _reduce(jnp.max, np.max),
    "ReduceMin": _reduce(jnp.min, np.min),
    "ReduceProd": _reduce(jnp.prod, np.prod),
    "GlobalAveragePool": lambda node, a, host: jnp.mean(
        jnp.asarray(a[0]), axis=tuple(range(2, np.ndim(a[0]))),
        keepdims=True),
    "MaxPool": _pool(lax.max, -np.inf, avg=False),
    "AveragePool": _pool(lax.add, 0.0, avg=True),
    "BatchNormalization": _batchnorm,
    "InstanceNormalization": _instancenorm,
    "LayerNormalization": _layernorm,
    "Resize": _resize,
    "Upsample": _resize,
    "Pad": _pad,
    "Split": _split,
}


class OnnxDepthPredictor:
    """DepthPredictor-contract wrapper over an arbitrary ONNX depth graph
    (the reference's run_onnx closure, render_depth.py:832-954): input
    introspection, ImageNet normalization, /32-snapped inference size,
    [B, H, W, 3] float01 in -> [B, s, s] raw depth out."""

    IMAGENET_MEAN = (0.485, 0.456, 0.406)
    IMAGENET_STD = (0.229, 0.224, 0.225)

    def __init__(self, onnx_path, inference_size: int = 518,
                 dtype: str = "float32"):
        self.exe = OnnxExecutor(onnx_path)
        if not self.exe.inputs:
            raise ValueError(f"{onnx_path}: graph has no inputs")
        name, shape = self.exe.inputs[0]
        self.input_name = name
        rank = len(shape) if shape else 4
        if rank not in (4, 5):
            raise OnnxUnsupportedOp(
                f"{onnx_path}: rank-{rank} input (expect [B,3,H,W] image "
                "or [1,T,3,H,W] video)")
        self.video = rank == 5
        # fixed spatial dims win over the requested size (reference
        # warm-up sweep analog: the graph knows best)
        s = inference_size
        if shape:
            fixed = [d for d in shape[-2:] if d]
            if len(fixed) == 2 and fixed[0] == fixed[1]:
                s = fixed[0]
        self._size = max(32, s - s % 32)
        self.params = jax.device_put(
            {k: jnp.asarray(v) if v.dtype != np.int64 else v
             for k, v in self.exe.initializers.items()})
        mean = np.asarray(self.IMAGENET_MEAN, np.float32)
        std = np.asarray(self.IMAGENET_STD, np.float32)

        def forward(params, frames01):  # [B, H, W, 3]
            from ..ops.resize import resize_bilinear

            x = resize_bilinear(frames01, (self._size, self._size),
                                channel_last=True)
            x = (x - mean) / std
            x = x.transpose(0, 3, 1, 2)  # NCHW
            if self.video:
                x = x[None]  # [1, T, 3, H, W]
            out = self.exe.run(params, {self.input_name: x})[0]
            out = jnp.asarray(out)
            out = out.reshape((-1,) + out.shape[-2:])  # [B, h, w]
            return out

        self._forward = forward
        self._jit = jax.jit(forward)

    def __call__(self, frames01) -> jnp.ndarray:
        return self._jit(self.params, jnp.asarray(frames01))
