"""Worker process for tests/test_distributed.py: one of two 'hosts' in a
jax.distributed CPU cluster (4 local devices each -> global 8-device mesh).

Both workers synthesize the SAME deterministic clip, decode it on the global
mesh, cross-check a DCN reduction, and export their frame shard to DNG.
"""

import sys


def main() -> int:
    port, pid, outdir = sys.argv[1], int(sys.argv[2]), sys.argv[3]

    import jax

    jax.config.update("jax_platforms", "cpu")

    from mcraw import distributed as D

    D.initialize(f"localhost:{port}", 2, pid, local_device_count=4)

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert len(jax.local_devices()) == 4

    from mcraw import encode as E
    from mcraw.metadata import (
        example_container_metadata,
        example_frame_metadata,
    )
    from mcraw.pipeline import Decoder

    rng = np.random.default_rng(1234)
    writer = E.ContainerWriter(example_container_metadata())
    frames = []
    for i in range(8):
        img = rng.integers(0, 4096, size=(16, 128), dtype=np.uint16)
        frames.append(img)
        writer.add_frame(100 + i, E.encode_modern(img), example_frame_metadata(128, 16))
    blob = writer.finish()

    d = Decoder(blob, backend="jax")
    mesh = Mesh(np.array(jax.devices()), ("frames",))

    imgs, metas = D.decode_batch_global_mesh(d, d.frames, mesh)
    assert len(imgs.sharding.device_set) == 8
    assert len(metas) == 4  # this host's shard only

    # Cross-host reduction (rides DCN): global checksum must replicate.
    tot = int(jnp.sum(imgs.astype(jnp.uint32))) & 0xFFFFFFFF
    want = sum(int(f.astype(np.int64).sum()) for f in frames) & 0xFFFFFFFF
    assert tot == want, (tot, want)

    # Every locally-addressable shard decodes its exact frames.
    for shard in imgs.addressable_shards:
        i0 = shard.index[0].start or 0
        arr = np.asarray(shard.data)
        for k in range(arr.shape[0]):
            assert np.array_equal(arr[k], frames[i0 + k]), (i0, k)

    # Host-sharded DNG export: disjoint global numbering, no comms.
    stats = D.export_clip_distributed(d, outdir)
    assert stats.frames_done == 4, stats.errors[:2]

    print(f"WORKER-OK {pid}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
