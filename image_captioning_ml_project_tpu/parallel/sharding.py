"""Parameter sharding rules: data parallelism + optional tensor parallelism.

Pure DP replicates everything (the default; see
:func:`..parallel.mesh.replicate`). For large decoders (the reference
mentions GPT-2 774M, README.md:416) the mesh's ``model`` axis can shard the
transformer's matmuls Megatron-style:

* fused qkv ``c_attn`` kernel [H, 3H] → shard the output (head) dim;
* attention output ``c_proj`` [H, H] → shard the input dim;
* MLP ``c_fc`` [H, 4H] → shard the output dim;
* MLP ``c_proj`` [4H, H] → shard the input dim;
* embeddings / layernorms / biases → replicated.

Only the *placement* is specified here — jit/GSPMD derives the collectives
(an all-reduce after attention and MLP outputs) from these shardings; no
manual psums. Optimizer state inherits placements because optax init uses
``zeros_like`` on already-sharded params.

Note on the fused qkv shard: with ``c_attn`` packed as [q; k; v] blocks,
sharding its last dim over M devices splits each block contiguously, which
keeps head groups intact as long as ``num_heads % M == 0`` — the same
constraint as Megatron.
"""

from __future__ import annotations

import re
from typing import Any, List, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path regex, partition spec builder) — first match wins
GPT2_TP_RULES: List[Tuple[str, Tuple]] = [
    (r".*attn/c_attn/kernel$", (None, "model")),
    (r".*attn/c_attn/bias$", ("model",)),
    (r".*attn/c_proj/kernel$", ("model", None)),
    (r".*mlp/c_fc/kernel$", (None, "model")),
    (r".*mlp/c_fc/bias$", ("model",)),
    (r".*mlp/c_proj/kernel$", ("model", None)),
]


def _path_str(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def infer_param_shardings(params: Any, mesh: Mesh,
                          rules: List[Tuple[str, Tuple]] = GPT2_TP_RULES,
                          model_axis: str = "model") -> Any:
    """Pytree of NamedShardings: rule matches get TP specs (when the model
    axis has size > 1 and the dim divides), everything else replicated."""
    model_size = mesh.shape.get(model_axis, 1)

    def assign(path, leaf):
        ps = _path_str(path)
        if model_size > 1:
            for pattern, spec in rules:
                if re.match(pattern, ps):
                    spec = tuple(model_axis if s == "model" else s
                                 for s in spec)
                    # only shard if the dimension divides evenly
                    ok = True
                    for dim, s in zip(leaf.shape, spec):
                        if s is not None and dim % model_size != 0:
                            ok = False
                    if ok and len(spec) == leaf.ndim:
                        return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(assign, params)


def shard_params(params: Any, mesh: Mesh,
                 rules: List[Tuple[str, Tuple]] = GPT2_TP_RULES) -> Any:
    """Device-put params according to :func:`infer_param_shardings`."""
    shardings = infer_param_shardings(params, mesh, rules)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
