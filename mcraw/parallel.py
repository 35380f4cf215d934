"""Multi-frame / multi-chip decode: batching, vmap, and shard_map.

The decode workload is embarrassingly frame-parallel (the EOF index gives
O(1) random access to every frame, Decoder.cpp:237-264), so the natural TPU
mapping is frame data-parallelism: stack per-frame device inputs along a
batch axis, vmap the single-frame decode, and shard the batch axis across a
``jax.sharding.Mesh`` — XLA then runs each frame's unpack on its own chip
with zero cross-device communication until (optional) gather-for-output.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .kernels import unpack as U


def stack_plans(plans: list, modern: bool):
    """Pad + stack per-frame plans into batch arrays.

    Payload lengths vary per frame; they are padded to the batch max (the
    per-block offsets make the padding bytes unreachable). Block counts are
    identical for same-geometry frames.
    """
    geo = {
        (p.tiles_y, p.tiles_x, p.width, p.height)
        if modern
        else (p.padded_width, p.width, p.height)
        for p in plans
    }
    if len(geo) != 1:
        raise ValueError("all frames in a batch must share geometry")

    max_len = max(len(p.payload) for p in plans)
    max_len += (-max_len) % 8
    payloads = np.zeros((len(plans), max_len), dtype=np.uint8)
    for i, p in enumerate(plans):
        payloads[i, : len(p.payload)] = p.payload
    offsets = np.stack([p.offsets for p in plans])
    cls = np.stack([p.cls for p in plans])
    refs = np.stack([p.refs for p in plans])
    return payloads, offsets, cls, refs


def _batched_modern(tiles_y, tiles_x, width, height):
    def one(payload, offsets, cls, refs):
        return U.decode_modern_device.__wrapped__(
            payload, offsets, cls, refs,
            tiles_y=tiles_y, tiles_x=tiles_x, width=width, height=height,
        )

    return jax.jit(jax.vmap(one))


def _batched_legacy(padded_width, width, height):
    def one(payload, offsets, cls, refs):
        return U.decode_legacy_device.__wrapped__(
            payload, offsets, cls, refs,
            padded_width=padded_width, width=width, height=height,
        )

    return jax.jit(jax.vmap(one))


def batched_decoder(plan, modern: bool):
    """Jitted (F, ...) -> (F, H, W) decode function for one geometry."""
    if modern:
        return _batched_modern(plan.tiles_y, plan.tiles_x, plan.width, plan.height)
    return _batched_legacy(plan.padded_width, plan.width, plan.height)


def decode_frames_batched(
    plans: list, modern: bool, mesh: Mesh | None = None, kernel: str = "auto"
):
    """Decode a batch of same-geometry frames in one device program.

    With a mesh, inputs are placed with frame-batch sharding over the first
    mesh axis and jit partitions the whole decode accordingly (SPMD, no
    collectives needed — frames are independent). On a single accelerator,
    the modern codec uses the fused Pallas kernel (frames concatenated into
    one launch); the XLA path covers CPU and sharded meshes.
    """
    use_pallas = modern and (
        kernel == "pallas"
        or (
            kernel == "auto"
            and mesh is None
            and jax.devices()[0].platform not in ("cpu",)
        )
    )
    if use_pallas:
        from .kernels import pallas_unpack as PK

        return PK.decode_modern_pallas_batch_v5(plans)

    payloads, offsets, cls, refs = stack_plans(plans, modern)
    fn = batched_decoder(plans[0], modern)

    if mesh is not None:
        axis = mesh.axis_names[0]
        n = mesh.devices.size
        if len(plans) % n != 0:
            raise ValueError(f"batch of {len(plans)} not divisible by {n} devices")
        sharding = NamedSharding(mesh, P(axis))
        args = [
            jax.device_put(a, sharding) for a in (payloads, offsets, cls, refs)
        ]
        return fn(*args)

    return fn(
        jnp.asarray(payloads), jnp.asarray(offsets), jnp.asarray(cls), jnp.asarray(refs)
    )


def default_mesh(axis: str = "frames") -> Mesh:
    devices = np.array(jax.devices())
    return Mesh(devices, (axis,))


def decode_clips(decoders: list, mesh: Mesh | None = None, frames_per_clip=None):
    """Concurrent multi-clip decode (BASELINE config 4): interleave frames
    from several same-geometry clips into one frame-sharded batch.

    Returns (imgs (C, F, H, W) device array, metas [C][F]). Clips must share
    frame geometry and codec; frames are round-robin interleaved so each
    chip gets a mix of clips (uniform load even if clips differ in content).
    """
    all_plans, all_metas, moderns = [], [], []
    for d in decoders:
        ts = d.frames if frames_per_clip is None else d.frames[:frames_per_clip]
        plans, metas = [], []
        for t in ts:
            plan, meta, modern = d._plan(t)
            plans.append(plan)
            metas.append(meta)
            moderns.append(modern)
        all_plans.append(plans)
        all_metas.append(metas)
    if len({len(p) for p in all_plans}) != 1:
        raise ValueError("clips must contribute equal frame counts")
    if len(set(moderns)) != 1:
        raise ValueError("mixed codecs across clips")

    c, f = len(all_plans), len(all_plans[0])
    # round-robin interleave: batch index = frame*C + clip
    flat = [all_plans[ci][fi] for fi in range(f) for ci in range(c)]
    imgs = decode_frames_batched(flat, moderns[0], mesh=mesh)
    h, w = imgs.shape[1], imgs.shape[2]
    imgs = imgs.reshape(f, c, h, w).transpose(1, 0, 2, 3)
    return imgs, all_metas
