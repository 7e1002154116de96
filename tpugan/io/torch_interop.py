"""Torch checkpoint interop: load reference ``.pth`` files into tpugan
params and export tpugan params as reference-loadable state_dicts.

Migration story for users of the reference zoo: a generator trained with
e.g. ``cyclegan/cyclegan.py`` checkpoints to ``torch.save(G.state_dict())``
(cyclegan/cyclegan.py:279-284); ``import_state_dict`` maps that file onto
the matching tpugan module's params so training/inference continues here,
and ``export_state_dict`` produces a state_dict the reference script's
``load_state_dict(..., strict=True)`` accepts (pix2pix/pix2pix.py:71-73),
so checkpoints flow both ways.

Mechanism: every tpugan architecture mirrors its reference counterpart's
layer sequence (pinned by the golden forward-parity tests), so pairing is
by KIND and SHAPE in order: each torch entry, walked in state_dict order,
claims the first unused tpugan leaf of the same kind whose (layout-
transformed) shape matches. The flax side walks params in INSERTION
order — flax scopes are created in call order, so insertion order IS the
layer sequence (sorting scope names naturally would NOT be: e.g.
``ConvTranspose_0`` sorts before ``Conv_0`` while encoder-decoder models
run all down-convs first, which cross-assigned identically-shaped conv
and conv-transpose kernels). The shape gate still rejects any residual
misalignment loudly rather than loading garbage.
Layout transforms per kind (tests/test_golden_parity.py conventions):

  conv / conv-transpose weight  torch OIHW / IOHW  <- transpose(3,2,0,1) ->
                                flax HWIO / HWOI (transpose_kernel=True)
  linear weight                 torch (O, I)       <- .T ->  flax (I, O)
  embedding weight              identical (N, D)
  norm weight/bias              identical (C,) (flax names it scale/bias)
  running_mean/var              identical (C,) (flax batch_stats mean/var)

Kind detection on the torch side is by shape and naming shape: a 4-D
``*.weight`` is a conv; a 2-D ``*.weight`` WITH a sibling bias is a linear
and WITHOUT one is an embedding (true throughout the reference zoo — its
Linears always carry biases, its Embeddings never do); 1-D ``*.weight`` is
a norm scale. ``num_batches_tracked`` entries are ignored on import and
emitted as zeros on export (the reference never reads them).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import numpy as np


def _walk(tree: Dict, prefix: Tuple[str, ...] = ()):
    """DFS over a nested param dict in INSERTION order, yielding
    (path, leaf_array) pairs. Flax creates scopes in call order during
    ``init`` and dict order survives (de)serialization against an
    init-derived template, so insertion order is the module call
    sequence — unlike any name sort (``ConvTranspose_0`` < ``Conv_0``)."""
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _walk(v, prefix + (k,))
        else:
            yield prefix + (k,), v


def _collect_flax(params: Dict) -> Dict[str, List[Tuple[tuple, Any]]]:
    """Group flax param leaves by kind, preserving order."""
    groups: Dict[str, List[Tuple[tuple, Any]]] = {
        "conv_kernel": [], "conv_bias": [],
        "linear_kernel": [], "linear_bias": [],
        "embedding": [], "norm_scale": [], "norm_bias": [],
        "prelu": [],
    }
    leaves = list(_walk(params))
    biases = []
    for path, leaf in leaves:
        name = path[-1]
        nd = np.ndim(leaf)
        if name == "kernel" and nd == 4:
            groups["conv_kernel"].append((path, leaf))
        elif name == "kernel" and nd == 2:
            groups["linear_kernel"].append((path, leaf))
        elif name == "embedding":
            groups["embedding"].append((path, leaf))
        elif name == "scale":
            groups["norm_scale"].append((path, leaf))
        elif name == "alpha":
            # PReLU slope (nn/layers.py:PReLU) — torch stores it as a 1-D
            # 'weight' with no sibling bias (srgan/models.py:24).
            groups["prelu"].append((path, leaf))
        elif name == "gamma":
            # MUNIT's custom LayerNorm affine (munit/models.py:315-316;
            # nn/layers.py:LayerNormSpatial) names its scale/shift
            # gamma/beta on both sides.
            groups["norm_scale"].append((path, leaf))
        elif name == "beta":
            groups["norm_bias"].append((path, leaf))
        elif name == "bias":
            biases.append((path, leaf))
        else:
            raise ValueError(f"unrecognized flax param leaf {path}")
    # Second pass: attribute each bias to the parameterized layer sharing
    # its scope (kernel/scale may sort after 'bias' within a scope, so this
    # cannot happen inline above).
    owner_by_scope = {}
    for g in ("conv_kernel", "linear_kernel", "norm_scale"):
        for p, _ in groups[g]:
            owner_by_scope[p[:-1]] = g
    for path, leaf in biases:
        owner = owner_by_scope.get(path[:-1])
        if owner == "conv_kernel":
            groups["conv_bias"].append((path, leaf))
        elif owner == "linear_kernel":
            groups["linear_bias"].append((path, leaf))
        else:
            groups["norm_bias"].append((path, leaf))
    return groups


def _classify_torch(sd) -> List[Tuple[str, str]]:
    """Yield (torch_key, kind) in state_dict order; kinds mirror
    _collect_flax plus running_mean / running_var / skip."""
    keys = list(sd.keys())
    out = []
    for k in keys:
        v = sd[k]
        nd = v.dim() if hasattr(v, "dim") else np.ndim(v)
        base = k.rsplit(".", 1)[-1]
        scope = k.rsplit(".", 1)[0] if "." in k else ""
        if base == "num_batches_tracked":
            out.append((k, "skip"))
        elif base == "running_mean":
            out.append((k, "running_mean"))
        elif base == "running_var":
            out.append((k, "running_var"))
        elif base == "weight" and nd == 4:
            out.append((k, "conv_kernel"))
        elif base == "weight" and nd == 2:
            has_bias = (scope + ".bias" if scope else "bias") in sd
            out.append((k, "linear_kernel" if has_bias else "embedding"))
        elif base == "weight" and nd == 1:
            # Affine norms always carry a sibling bias in the reference
            # zoo; a lone 1-D weight is a PReLU slope (srgan/models.py:24).
            has_bias = (scope + ".bias" if scope else "bias") in sd
            out.append((k, "norm_scale" if has_bias else "prelu"))
        elif base == "gamma":
            # MUNIT custom LayerNorm (munit/models.py:315-316).
            out.append((k, "norm_scale"))
        elif base == "beta":
            out.append((k, "norm_bias"))
        elif base == "bias":
            # Bias kind follows its scope's weight kind.
            wkey = (scope + ".weight") if scope else "weight"
            wnd = sd[wkey].dim() if hasattr(sd[wkey], "dim") else np.ndim(sd[wkey])
            out.append(
                (k, {4: "conv_bias", 2: "linear_bias", 1: "norm_bias"}[wnd])
            )
        else:
            raise ValueError(f"unrecognized torch state_dict entry {k}")
    return out


def _to_flax(kind: str, t: np.ndarray) -> np.ndarray:
    if kind == "conv_kernel":
        return t.transpose(2, 3, 1, 0)  # OIHW/IOHW -> HWIO/HWOI
    if kind == "linear_kernel":
        return t.T
    if kind == "prelu":
        return t.reshape(())  # torch (1,) -> flax scalar alpha
    return t


def _to_torch(kind: str, a: np.ndarray) -> np.ndarray:
    if kind == "conv_kernel":
        return a.transpose(3, 2, 0, 1)
    if kind == "linear_kernel":
        return a.T
    if kind == "prelu":
        return a.reshape((1,))
    return a


def _set_path(tree: Dict, path: tuple, value) -> None:
    for k in path[:-1]:
        tree = tree[k]
    old = tree[path[-1]]
    if tuple(np.shape(old)) != tuple(np.shape(value)):
        raise ValueError(
            f"shape mismatch at {path}: {np.shape(old)} vs {np.shape(value)}"
        )
    tree[path[-1]] = np.asarray(value, dtype=np.asarray(old).dtype)


def _deepcopy(tree):
    if isinstance(tree, dict):
        return {k: _deepcopy(v) for k, v in tree.items()}
    return tree


def _is_dummy_stat(kind: str, value: np.ndarray) -> bool:
    """True iff a running stat still holds its registration default
    (mean == 0, var == 1) — the signature of AdaptiveInstanceNorm2d's dummy
    buffers (munit/models.py:277-279), which have no tpugan counterpart."""
    target = 0.0 if kind == "running_mean" else 1.0
    return bool(np.all(np.asarray(value) == target))


def import_state_dict(
    params: Dict,
    state_dict,
    batch_stats: Optional[Dict] = None,
) -> Tuple[Dict, Optional[Dict]]:
    """Map a reference torch ``state_dict`` (as saved by ``torch.save(
    module.state_dict())``) onto matching tpugan (params, batch_stats).

    Returns new trees; inputs are not mutated. Raises on any count or
    shape mismatch (no silent partial loads).
    """
    new_params = _deepcopy(params)
    new_bs = _deepcopy(batch_stats) if batch_stats is not None else None
    groups = _collect_flax(new_params)
    if new_bs:
        groups["running_mean"], groups["running_var"] = [], []
        for path, leaf in _walk(new_bs):
            if path[-1] == "mean":
                groups["running_mean"].append((path, leaf))
            elif path[-1] == "var":
                groups["running_var"].append((path, leaf))
    used = {k: [False] * len(v) for k, v in groups.items()}
    for tkey, kind in _classify_torch(state_dict):
        if kind == "skip":
            continue
        t = state_dict[tkey]
        t = t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)
        value = _to_flax(kind, t)
        tree = new_bs if kind in ("running_mean", "running_var") else new_params
        pool = groups.get(kind, [])
        hit = next(
            (
                i
                for i, (p, leaf) in enumerate(pool)
                if not used[kind][i]
                and tuple(np.shape(leaf)) == tuple(value.shape)
            ),
            None,
        )
        if hit is None:
            if kind in ("running_mean", "running_var") and _is_dummy_stat(
                kind, value
            ):
                # AdaptiveInstanceNorm2d registers never-used default
                # running stats ("just dummy buffers, not used",
                # munit/models.py:277-279); tpugan's adain is stateless, so
                # default-valued stats with no counterpart are dropped.
                continue
            raise ValueError(
                f"torch entry {tkey!r} ({kind}, shape {tuple(value.shape)})"
                " has no unused tpugan counterpart"
            )
        used[kind][hit] = True
        _set_path(tree, pool[hit][0], value)
    for kind, flags in used.items():
        if not all(flags):
            raise ValueError(
                f"{flags.count(False)} tpugan {kind} leaves unmatched"
            )
    return new_params, new_bs


def export_state_dict(
    params: Dict,
    template_state_dict,
    batch_stats: Optional[Dict] = None,
):
    """Produce a torch-loadable state_dict (same keys as
    ``template_state_dict`` — obtain one from the reference module via
    ``module.state_dict()``) filled with tpugan parameter values.

    Returns an OrderedDict of torch tensors ready for ``torch.save`` /
    ``load_state_dict(strict=True)``.
    """
    import collections

    import torch

    groups = _collect_flax(params)
    groups["running_mean"], groups["running_var"] = [], []
    if batch_stats:
        for path, leaf in _walk(batch_stats):
            if path[-1] == "mean":
                groups["running_mean"].append((path, leaf))
            elif path[-1] == "var":
                groups["running_var"].append((path, leaf))
    used = {k: [False] * len(v) for k, v in groups.items()}
    out = collections.OrderedDict()
    for tkey, kind in _classify_torch(template_state_dict):
        tmpl = template_state_dict[tkey]
        if kind == "skip":
            out[tkey] = (
                tmpl.clone() if hasattr(tmpl, "clone") else np.array(tmpl)
            )
            continue
        want = tuple(tmpl.shape)
        pool = groups.get(kind, [])
        hit = next(
            (
                i
                for i, (p, leaf) in enumerate(pool)
                if not used[kind][i]
                and _to_torch(kind, np.asarray(leaf)).shape == want
            ),
            None,
        )
        if hit is None:
            tmpl_np = (
                tmpl.detach().cpu().numpy() if hasattr(tmpl, "detach")
                else np.asarray(tmpl)
            )
            if kind in ("running_mean", "running_var") and _is_dummy_stat(
                kind, tmpl_np
            ):
                # AdaIN dummy buffers (see import_state_dict): emit the
                # registration defaults the reference module expects.
                out[tkey] = torch.from_numpy(np.array(tmpl_np, copy=True))
                continue
            raise ValueError(
                f"torch template entry {tkey!r} ({kind}, shape {want}) has"
                " no unused tpugan counterpart"
            )
        used[kind][hit] = True
        a = _to_torch(kind, np.asarray(pool[hit][1], np.float32))
        out[tkey] = torch.from_numpy(np.array(a, copy=True))
    return out
