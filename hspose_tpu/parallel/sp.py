"""Sequence parallelism: shard the point axis N over a mesh axis for serving.

The reference is single-GPU with N fixed at 1028; SURVEY.md §5.7 names the
point count the "sequence length" analog of this workload, with the O(N²) KNN
as the quadratic-cost component.  SP is the ring-attention-style answer for
the large-N regime: each device owns N/sp query points, per layer the source
side (vertex/feature maps) is all-gathered over ICI while KNN searches,
neighbour gathers, HS reductions and all per-point outputs stay local, and the
cross-N reductions (centering mean, ORL global mean, head max-pools) finish as
psum-family collectives.  Compute and VMEM-resident working sets scale 1/sp;
the all-gathered sources are O(N·C) HBM, far below the O(N²/sp) distance work.

Constraint: the GLOBAL point count must divide by 16·sp so both pooled
resolutions (N/4, N/16) shard evenly — i.e. the large-N configs (2048, 4096,
...), not the 1028-point REAL275 config, which shards over the batch axis
instead (pure DP serves it perfectly at batch 256).

Composes with data parallelism as a 2-D (dp, sp) mesh: crops shard over dp,
points over sp.  Not composable with mp (the Dense-channel tensor sharding) in
one mesh — serving at large N wants all non-dp devices on the point axis.
"""

from __future__ import annotations

from typing import Tuple

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P


def make_sp_mesh(dp: int, sp: int, devices=None) -> Mesh:
    """2-D (dp, sp) mesh over the first dp*sp devices."""
    devices = devices if devices is not None else jax.devices()
    if dp * sp > len(devices):
        raise ValueError(f"dp*sp={dp}*{sp} > {len(devices)} devices")
    return Mesh(np.array(devices[:dp * sp]).reshape(dp, sp), ("dp", "sp"))


def sp_eval_fn(model, mesh: Mesh, with_rt: bool = True):
    """Build the sequence-parallel serving forward.

    Returns ``fn(params, batch_stats, pc, obj_id, sym, mean_shape, key)`` ->
    ``(RT (B,4,4), scales (B,3))`` (or the raw PoseNetOutput vec fields when
    ``with_rt=False``), jit-compiled with the point axis of ``pc`` sharded
    over the mesh's "sp" axis and the crop batch over "dp".

    The per-crop head outputs are bitwise replicated across sp (they are
    produced by collectives), so the sp axis simply does not appear in the
    output specs; pose assembly (generate_RT) runs on the replicated values.
    """
    from hspose_tpu.geometry.rotations import generate_RT
    from hspose_tpu.models.hspose import eval_forward

    def local_fn(params, batch_stats, pc, obj_id, key):
        out = eval_forward(model, params, batch_stats, key, pc, obj_id,
                           sp_axis="sp")
        return (out.p_green_R, out.p_red_R, out.f_green_R, out.f_red_R,
                out.pred_T, out.pred_s)

    sharded = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), P(), P("dp", "sp"), P("dp"), P()),
        out_specs=P("dp"),
        check_vma=False,  # outputs are replicated over sp by construction
    )

    @jax.jit
    def fn(params, batch_stats, pc, obj_id, sym, mean_shape, key):
        green, red, fg, fr, T, s = sharded(params, batch_stats, pc, obj_id, key)
        if not with_rt:
            return green, red, fg, fr, T, s
        RT = generate_RT(green, red, fg, fr, T, sym)
        return RT, s + mean_shape

    return fn


def sp_points_per_device(n_points: int, sp: int) -> Tuple[int, int]:
    """Validate the SP divisibility rule; returns (local N, global N)."""
    if n_points % (16 * sp):
        raise ValueError(
            f"sequence parallelism needs num_points % (16*sp) == 0 so both "
            f"pooled resolutions shard evenly; got N={n_points}, sp={sp}")
    return n_points // sp, n_points
