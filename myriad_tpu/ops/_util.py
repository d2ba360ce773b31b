"""Shared helpers for the Pallas op wrappers.

One home for the alignment/platform helpers (previously four drifting
copies) and for the (batch, head)-independent ``custom_partitioning``
scaffold that the decode-row and prefill attention kernels both need.
"""

from __future__ import annotations

import jax


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def on_tpu() -> bool:
    """True when the default backend is a TPU; False on init failure (a
    bare ``jax.devices()[0].platform`` can raise before backend init)."""
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover - backend init failure
        return False


def make_bh_partitioned(fn, arg_axes, rule):
    """GSPMD wrapper for kernels independent per (batch row, head).

    Under a (dp, tp) mesh each shard runs ``fn`` on its own local
    (B_loc, H_loc) block — ``custom_partitioning`` declares exactly that,
    so XLA partitions the custom call instead of gathering full arrays
    around it.  The batch/head mesh axes are inferred from the FIRST
    argument's (q's) sharding.

    ``arg_axes``: one tuple per argument, an entry per array dim, each
    'b' (shard like q's batch axis), 'h' (like q's head axis) or None
    (replicated).  The output is ('b', 'h', None, None).
    ``rule``: the Shardy einsum-like sharding rule for the same signature
    (jax >= 0.9 requires it alongside the callbacks).
    """
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    f = custom_partitioning(fn)

    def _specs(mesh, q_sharding):
        qs = q_sharding.spec if q_sharding is not None else P()
        ax = {"b": qs[0] if len(qs) > 0 else None,
              "h": qs[1] if len(qs) > 1 else None, None: None}
        mk = lambda *spec: NamedSharding(mesh, P(*spec))
        args = [mk(*(ax[a] for a in axes)) for axes in arg_axes]
        return args, mk(ax["b"], ax["h"], None, None)

    def infer(mesh, arg_infos, result_shape):
        return _specs(mesh, getattr(arg_infos[0], "sharding", None))[1]

    def partition(mesh, arg_infos, result_shape):
        args, out = _specs(mesh, getattr(arg_infos[0], "sharding", None))
        return mesh, fn, out, tuple(args)

    f.def_partition(infer_sharding_from_operands=infer, partition=partition,
                    sharding_rule=rule)
    return jax.jit(f)
