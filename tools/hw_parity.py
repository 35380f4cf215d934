#!/usr/bin/env python3
"""Hardware parity sweep: Mosaic-compiled kernels vs the exact oracle.

Interpret-mode tests (tests/test_pallas.py) prove the kernel MATH; this
sweep proves the MOSAIC-COMPILED binaries on the real chip — a failure
class interpret cannot see, and one that has actually occurred (the
wide_store / chunk_desc / legacy sub=N variants all compile and pass in
interpret mode but SIGABRT or miscompile only on hardware).

Grid: geometries x content archetypes x both codecs x both device paths
(v5 host-meta and v6 device-prep). Every decode is verified by an
on-device uint32 checksum against the known source image (the encoder is
a tested exact inverse, so the source IS the oracle) — no frame is ever
materialized to the host (the tunnel's D2H makes that pathological, see
CLAUDE.md). Each case runs in a SUBPROCESS so a Mosaic crash records a
"CRASH" row instead of killing the sweep; the persistent compile cache
(/root/.cache/jax_comp) makes re-runs cheap.

Usage:
  python tools/hw_parity.py            # full grid -> tools/hw_parity_results.json
  python tools/hw_parity.py --quick    # 4K + 1080p, default content only
  python tools/hw_parity.py --case '{"h":..}'   # internal: one case, one JSON line
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE_DIR = "/root/.cache/mcraw_hwpar"

# (h, w) — chosen to hit distinct Mosaic specializations: the bench 4K
# geometry, the most common phone sensor (4032 wide: legacy pw % 128 = 64,
# the ragged device-prep path lifted in r3), 1080p, a tiny clip, and a
# small ragged-legacy width (pw = 288, % 128 = 32).
GEOMETRIES = {
    "4k": (3072, 4096),
    "phone": (3024, 4032),
    "1080p": (1080, 1920),
    "tiny": (96, 320),
    "ragged": (48, 288),
}

CONTENTS = ("mid12", "full16", "zeros", "lo10", "mix16")

# Shipping variant flags (VERDICT r3 #8): every kernel kwarg reachable
# WITHOUT MCRAW_UNSAFE_VARIANTS, swept on hardware each round so no
# flag in the default namespace can rot into a Mosaic crash unseen.
# (wide_store / chunk_desc / legacy sub=N are quarantined behind
# MCRAW_UNSAFE_VARIANTS — known SIGABRTs, deliberately NOT swept.)
MODERN_V5_FLAGS = {
    "out3d": {"flat_out": False},
    "chunk_mt": {"chunk_mt": True},
    "chunk_oh": {"chunk_oh": True},
    "chunk_oh_halves": {"chunk_oh": True, "plane_mode": "halves"},
    "halves": {"plane_mode": "halves"},
    "packed": {"plane_mode": "packed"},
    "packed2": {"plane_mode": "packed2"},
    "s8": {"plane_mode": "s8"},
    "desc_bytedot": {"desc_mode": "bytedot"},
    "pick_stack": {"pick_stack": True},
}
LEGACY_V5_FLAGS = {
    # (meta_layout="lanes" is NOT a caller flag: it changes the meta
    # input layout contract; the v6 m24="lanes" case covers that kernel
    # branch with correctly-built inputs.)
    "bytes": {"plane_mode": "bytes"},
    "packed2": {"plane_mode": "packed2"},
    "meta_dot3": {"meta_mode": "dot3"},
    "meta_onedot": {"meta_mode": "onedot"},
}
LEGACY_V6_FLAGS = {
    "widen": {"meta_dot": False},
    "m24": {"m24": True},
    "m24_lanes": {"m24": "lanes"},
    "meta_dot3": {"meta_mode": "dot3"},
    "bytes": {"plane_mode": "bytes"},
    "packed2": {"plane_mode": "packed2"},
}


def make_img(h: int, w: int, content: str, seed: int = 11) -> np.ndarray:
    rng = np.random.default_rng(seed)
    if content == "zeros":
        return np.zeros((h, w), np.uint16)
    if content == "full16":
        return rng.integers(0, 1 << 16, size=(h, w), dtype=np.uint16)
    if content == "lo10":
        return rng.integers(0, 1 << 10, size=(h, w), dtype=np.uint16)
    # mid12: smooth 12-bit field + noise — the bench's headline archetype
    # (mixed block classes, typical camera-ish entropy).
    base = (
        np.sin(np.arange(w) / 97)[None, :]
        * np.cos(np.arange(h) / 61)[:, None]
        * 1200
        + 2000
    )
    img = (base + rng.normal(0, 30, size=(h, w))).clip(0, 4095).astype(
        np.uint16
    )
    if content == "mix16":
        # mid12 with a full-range patch: class-16 blocks flow through the
        # GENERAL kernel (uniform16 stays off). Without this, no grid
        # content exercises the general path's class-16 field pass on
        # hardware — plain full16 takes the uniform16 fast path and the
        # other contents have no class-16 blocks at all.
        ph, pw = max(4, h // 4), max(64, w // 4)
        img[:ph, :pw] = rng.integers(0, 1 << 16, size=(ph, pw),
                                     dtype=np.uint16)
    return img


def get_payload(h: int, w: int, content: str, codec: int) -> np.ndarray:
    """Encode (slow on this 1-vCPU host) with a disk cache."""
    os.makedirs(CACHE_DIR, exist_ok=True)
    path = f"{CACHE_DIR}/{h}x{w}_{content}_c{codec}.npz"
    try:
        return np.load(path)["payload"]
    except Exception:
        pass
    from mcraw import encode as E

    img = make_img(h, w, content)
    enc = E.encode_modern(img) if codec == 7 else E.encode_legacy(img)
    payload = np.frombuffer(enc, dtype=np.uint8)
    tmp = path + f".tmp{os.getpid()}"
    np.savez(tmp, payload=payload)
    os.replace(tmp + ".npz", path)
    return payload


def _dev_setup(h: int, w: int):
    """Shared develop-case inputs (realistic non-diagonal color model)."""
    black = np.array([64, 64, 64, 64], np.float32)
    white = 4095.0
    neutral = np.array([0.61, 1.0, 0.72], np.float32)
    fwd = np.array(
        [
            [0.86, 0.08, 0.02],
            [0.04, 0.91, 0.05],
            [0.01, 0.06, 0.76],
        ],
        np.float32,
    )
    cfa = (0, 1, 1, 2)
    return black, white, neutral, fwd, cfa


def golden_develop(case: dict) -> str:
    """CPU-interpret golden RGBA for a develop case (run with
    JAX_PLATFORMS=cpu in a subprocess; Mosaic never touches it). The
    interpret kernel is the tested reference: <= 1 LSB vs the f64 model
    (tests/test_preview.py)."""
    h, w, content = case["h"], case["w"], case["content"]
    dem = case.get("demosaic", "bilinear")
    os.makedirs(CACHE_DIR, exist_ok=True)
    suffix = "" if dem == "bilinear" else f"_{dem}"
    path = f"{CACHE_DIR}/dev_{h}x{w}_{content}{suffix}.npz"
    if not os.path.exists(path):
        import jax.numpy as jnp

        from mcraw import preview
        from mcraw.kernels import pallas_develop as PD

        black, white, neutral, fwd, cfa = _dev_setup(h, w)
        img = make_img(h, w, content)
        inv2d = (
            preview._inv_dens_device(h, w, cfa).reshape(3 * h, w)
            if dem == "bilinear" else None
        )
        params = jnp.asarray(
            PD.pack_develop_params(black, white, neutral, fwd)
        )
        rgba = PD.develop_rgba_pallas(
            jnp.asarray(img), params, inv2d, height=h, width=w, cfa=cfa,
            demosaic=dem, interpret=True,
        )
        tmp = path + f".tmp{os.getpid()}"
        np.savez(tmp, rgba=np.asarray(rgba))
        os.replace(tmp + ".npz", path)
    return path


def run_case(case: dict) -> dict:
    """Decode one case on the device and checksum-verify. Runs in a
    subprocess (Mosaic SIGABRTs must not kill the sweep)."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    import jax.numpy as jnp

    from mcraw.kernels import pallas_legacy as PL
    from mcraw.kernels import pallas_unpack as PK
    from mcraw.kernels.checksum import device_checksum

    h, w, content, codec, path = (
        case["h"], case["w"], case["content"], case["codec"], case["path"],
    )
    img = make_img(h, w, content)

    if path == "dev":
        # Fused develop kernel: Mosaic output vs the CPU-interpret golden
        # (computed by a JAX_PLATFORMS=cpu subprocess; cached). exp/log
        # ulp differences CPU<->TPU may move a u8 by 1 at rounding
        # boundaries, so the gate is per-channel max |diff| <= 1.
        import jax.numpy as jnp

        from mcraw import preview
        from mcraw.kernels import pallas_develop as PD

        def fetch_golden(c):
            env = dict(os.environ, JAX_PLATFORMS="cpu")
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--golden",
                 json.dumps(c)],
                capture_output=True, text=True, timeout=2400, env=env,
                cwd="/tmp",  # keep the axon plugin out of the golden process
            )
            gline = next(
                (l for l in proc.stdout.splitlines()
                 if l.startswith("GOLDEN ")),
                None,
            )
            if gline is None:
                return None, "golden failed: " + (proc.stderr or "")[-200:]
            return np.load(gline[len("GOLDEN "):])["rgba"], ""

        golden, err = fetch_golden(
            {k: v for k, v in case.items() if k != "batch"}
        )
        if golden is None:
            return {**case, "status": "ERROR", "note": err}

        dem = case.get("demosaic", "bilinear")
        black, white, neutral, fwd, cfa = _dev_setup(h, w)
        inv2d = (
            preview._inv_dens_device(h, w, cfa).reshape(3 * h, w)
            if dem == "bilinear" else None
        )
        params = jnp.asarray(
            PD.pack_develop_params(black, white, neutral, fwd)
        )

        @jax.jit
        def maxdiff(a, b):
            d = jnp.int32(0)
            for sh in (0, 8, 16):
                ca = ((a >> jnp.uint32(sh)) & 0xFF).astype(jnp.int32)
                cb = ((b >> jnp.uint32(sh)) & 0xFF).astype(jnp.int32)
                d = jnp.maximum(d, jnp.max(jnp.abs(ca - cb)))
            return d

        if case.get("batch"):
            # Paired develop (bench.py preview legs, late r5): 2
            # distinct-content frames share ONE develop pallas call via
            # the kernel's native frame-major band grid (jax.vmap can't
            # lift its ANY-space operands); each output slice must match
            # its own interpret golden. Compute mode only — the bench
            # pairs run inv2d=None (compute==table is bitwise-pinned).
            case2 = {
                **{k: v for k, v in case.items() if k != "batch"},
                "content": case.get("content2", "lo10"),
            }
            golden2, err2 = fetch_golden(case2)
            if golden2 is None:
                return {**case, "status": "ERROR", "note": err2}
            img2 = make_img(h, w, case2["content"])

            t0 = time.perf_counter()
            pair = PD.develop_rgba_pallas(
                jnp.asarray(np.stack([img, img2])), params, None,
                height=h, width=w, cfa=cfa, demosaic=dem,
            )
            md = max(
                int(jax.block_until_ready(
                    maxdiff(pair[0], jnp.asarray(golden)))),
                int(jax.block_until_ready(
                    maxdiff(pair[1], jnp.asarray(golden2)))),
            )
            dt = time.perf_counter() - t0
            return {
                **case, "status": "OK" if md <= 1 else "MISMATCH",
                "max_u8_diff": md, "wall_s": round(dt, 2),
            }

        t0 = time.perf_counter()
        rgba = PD.develop_rgba_pallas(
            jnp.asarray(img), params, inv2d, height=h, width=w, cfa=cfa,
            demosaic=dem,
        )

        md = int(jax.block_until_ready(maxdiff(rgba, jnp.asarray(golden))))
        dt = time.perf_counter() - t0
        return {
            **case, "status": "OK" if md <= 1 else "MISMATCH",
            "max_u8_diff": md, "wall_s": round(dt, 2),
        }
    payload = get_payload(h, w, content, codec)
    want = int(img.astype(np.int64).sum() & 0xFFFFFFFF)

    kw = case.get("kw") or {}
    t0 = time.perf_counter()
    if codec == 7 and path == "v5":
        out = PK.decode_modern_pallas_v5(payload, w, h, **kw)
    elif codec == 7 and path == "v6":
        p32, bits, refs, ty, tx, spans = PK.prepare_modern_light(
            payload, w, h
        )
        out = PK.decode_modern_device_v6(
            jnp.asarray(p32), jnp.asarray(bits), jnp.asarray(refs),
            ty=ty, tx=tx, height=h, width=w,
            rows=spans[0], sub_rows=spans[1], nfields=spans[2],
        )
    elif codec == 6 and path == "v5":
        out = PL.decode_legacy_pallas_v5(payload, w, h, **kw)
    elif codec == 6 and path == "v6":
        light = PL.prepare_legacy_light(payload, w, h)
        if light is None:
            return {**case, "status": "SKIP", "note": "no light-prep path"}
        p32, offs, bits, refs, pw, rows = light
        out = PL.decode_legacy_device_v6(
            jnp.asarray(p32), jnp.asarray(offs), jnp.asarray(bits),
            jnp.asarray(np.asarray(refs, np.int32)),
            pw=pw, h=h, width=w, rows=rows, **kw,
        )
    else:
        return {**case, "status": "SKIP", "note": f"unknown path {path}"}

    got = int(jax.block_until_ready(device_checksum(out))) & 0xFFFFFFFF
    dt = time.perf_counter() - t0
    status = "OK" if got == want else "MISMATCH"
    return {
        **case, "status": status, "got": got, "want": want,
        "wall_s": round(dt, 2),
    }


def main() -> int:
    if "--golden" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
        case = json.loads(sys.argv[sys.argv.index("--golden") + 1])
        print("GOLDEN " + golden_develop(case))
        return 0

    if "--case" in sys.argv:
        case = json.loads(sys.argv[sys.argv.index("--case") + 1])
        try:
            res = run_case(case)
        except Exception as e:  # report, don't crash the line protocol
            res = {**case, "status": "ERROR", "note": repr(e)[:300]}
        print("HWPAR " + json.dumps(res))
        return 0 if res["status"] in ("OK", "SKIP") else 1

    if "--cases" in sys.argv:
        # Batched worker: amortize the ~30-60s tunnel jax-init over a
        # GROUP of cases (one HWPAR line per case, flushed as soon as it
        # finishes). A Mosaic SIGABRT still kills the process — the
        # driver re-runs the group's missing cases per-case.
        group = json.loads(sys.argv[sys.argv.index("--cases") + 1])
        rc = 0
        for case in group:
            try:
                res = run_case(case)
            except Exception as e:
                res = {**case, "status": "ERROR", "note": repr(e)[:300]}
            print("HWPAR " + json.dumps(res), flush=True)
            if res["status"] not in ("OK", "SKIP"):
                rc = 1
        return rc

    quick = "--quick" in sys.argv
    geoms = ["4k", "1080p"] if quick else list(GEOMETRIES)
    contents = ["mid12"] if quick else list(CONTENTS)
    if "--geoms" in sys.argv:  # comma-separated subset, e.g. --geoms 4k,phone
        geoms = sys.argv[sys.argv.index("--geoms") + 1].split(",")
    if "--contents" in sys.argv:
        contents = sys.argv[sys.argv.index("--contents") + 1].split(",")
    paths = ["v5", "v6", "dev"]
    if "--paths" in sys.argv:
        paths = sys.argv[sys.argv.index("--paths") + 1].split(",")
    tag = "_flags" if "--flags" in sys.argv else ""
    if "--tag" in sys.argv:  # results suffix so partial grids don't clobber
        tag = "_" + sys.argv[sys.argv.index("--tag") + 1]

    cases = []
    if "--flags" in sys.argv:
        # Shipping-flag sweep (VERDICT r3 #8): one geometry is enough —
        # the point is "does this Mosaic specialization compile + decode
        # exactly on hardware", not geometry coverage (the main grid has
        # that). mid12 exercises mixed classes; the modern sweep adds a
        # full16 default case so the uniform16 fast path is re-swept too.
        h, w = GEOMETRIES["4k"]
        for name, kw in MODERN_V5_FLAGS.items():
            cases.append(
                {
                    "geom": "4k", "h": h, "w": w, "content": "mid12",
                    "codec": 7, "path": "v5", "flag": name, "kw": kw,
                }
            )
        for name, kw in LEGACY_V5_FLAGS.items():
            cases.append(
                {
                    "geom": "4k", "h": h, "w": w, "content": "mid12",
                    "codec": 6, "path": "v5", "flag": name, "kw": kw,
                }
            )
        for name, kw in LEGACY_V6_FLAGS.items():
            cases.append(
                {
                    "geom": "4k", "h": h, "w": w, "content": "mid12",
                    "codec": 6, "path": "v6", "flag": name, "kw": kw,
                }
            )
        cases.append(
            {
                "geom": "4k", "h": h, "w": w, "content": "full16",
                "codec": 7, "path": "v5", "flag": "uniform16", "kw": {},
            }
        )
        cases.append(
            # Malvar demosaic (r5): the MHC 5x5 kernel path on silicon
            # vs the interpret golden.
            {
                "geom": "4k", "h": h, "w": w, "content": "mid12",
                "codec": 0, "path": "dev", "flag": "dev_malvar",
                "demosaic": "malvar",
            }
        )
        cases.append(
            # General kernel WITH class-16 blocks present (mix16 keeps
            # uniform16 off): the only hardware coverage of the general
            # path's 16-bit field pass now that full16 fast-paths.
            {
                "geom": "4k", "h": h, "w": w, "content": "mix16",
                "codec": 7, "path": "v5", "flag": "general_mix16", "kw": {},
            }
        )
        cases.append(
            # Paired develop (late r5): the bench preview legs batch 2
            # distinct frames through one develop pallas call (native
            # frame-major band grid) — cover it on silicon against
            # per-content interpret goldens.
            {
                "geom": "4k", "h": h, "w": w, "content": "mid12",
                "codec": 0, "path": "dev", "flag": "dev_batch",
                "batch": True,
            }
        )
        geoms, contents = [], []  # flags replace the main grid
    for g in geoms:
        h, w = GEOMETRIES[g]
        for content in contents:
            for codec in (7, 6):
                for path in ("v5", "v6"):
                    if path not in paths:
                        continue
                    cases.append(
                        {
                            "geom": g, "h": h, "w": w, "content": content,
                            "codec": codec, "path": path,
                        }
                    )
            if "dev" in paths:
                # develop takes a raw image, not a codec payload — one
                # case per (geometry, content)
                cases.append(
                    {
                        "geom": g, "h": h, "w": w, "content": content,
                        "codec": 0, "path": "dev",
                    }
                )
                if content == "mid12":
                    # Malvar demosaic (r5): one silicon case per
                    # geometry (content doesn't change the MHC paths).
                    cases.append(
                        {
                            "geom": g, "h": h, "w": w, "content": content,
                            "codec": 0, "path": "dev",
                            "flag": "dev_malvar", "demosaic": "malvar",
                        }
                    )

    def wait_relay(max_probes=70, sleep_s=240) -> bool:
        """The axon relay dies for hours at a time (CLAUDE.md) — executes
        HANG rather than error, so a wedged case burns its whole timeout.
        Gate every case on a bounded EXECUTE probe and wait out outages."""
        for p in range(max_probes):
            try:
                r = subprocess.run(
                    [sys.executable, "-c",
                     "import jax, jax.numpy as jnp; jax.devices(); "
                     "print(int(jnp.arange(8).sum()))"],
                    capture_output=True, timeout=90, cwd="/root/repo",
                )
                if r.returncode == 0:
                    return True
            except subprocess.TimeoutExpired:
                pass
            print(f"    relay down (probe {p + 1}); waiting", flush=True)
            time.sleep(sleep_s)
        return False

    def _write_results(results, tag, partial):
        """Persist after EVERY case (atomic replace): the relay dies for
        hours at a time and sweeps get killed by outer timeouts — a sweep
        that only writes at the end loses all its completed evidence."""
        out = {
            "partial": partial,
            "results": results,
            "summary": {
                s: sum(1 for r in results if r["status"] == s)
                for s in ("OK", "MISMATCH", "CRASH", "ERROR", "TIMEOUT",
                          "SKIP", "RELAY_DOWN")
            },
        }
        dst = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           f"hw_parity_results{tag}.json")
        with open(dst + ".tmp", "w") as f:
            json.dump(out, f, indent=1)
        os.replace(dst + ".tmp", dst)
        return out

    # --resume: keep already-OK rows from the existing results file and
    # only run the cases that are missing or non-OK. Without this a sweep
    # killed by a relay outage restarts from case 0 every time and never
    # converges (the r4 tail re-ran 9 already-green cases before dying).
    done = {}
    if "--resume" in sys.argv:
        dst = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           f"hw_parity_results{tag}.json")
        try:
            with open(dst) as f:
                for r in json.load(f).get("results", []):
                    if r.get("status") == "OK":
                        key = (r.get("geom"), r.get("content"),
                               r.get("codec"), r.get("path"), r.get("flag"))
                        done[key] = r
        except Exception:
            pass

    def _label(case):
        label = (
            f"{case['geom']} {case['content']} c{case['codec']} "
            f"{case['path']}"
        )
        if case.get("flag"):
            label += f" [{case['flag']}]"
        return label

    def _key(case):
        return (case.get("geom"), case.get("content"), case.get("codec"),
                case.get("path"), case.get("flag"))

    def _run_one(case):
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--case",
                 json.dumps(case)],
                capture_output=True, text=True, timeout=2400,
                cwd="/root/repo",  # axon plugin only initializes from here
            )
            line = next(
                (l for l in proc.stdout.splitlines()
                 if l.startswith("HWPAR ")),
                None,
            )
            if line:
                return json.loads(line[len("HWPAR "):])
            return {
                **case, "status": "CRASH", "rc": proc.returncode,
                "note": (proc.stderr or "")[-300:],
            }
        except subprocess.TimeoutExpired:
            return {**case, "status": "TIMEOUT"}

    # Partition pending cases into groups (contiguous, capped): one
    # subprocess per group amortizes the ~30-60s tunnel jax-init that
    # otherwise dominates a large grid. Cases a crashed/timed-out group
    # never reported fall back to the per-case runner.
    GROUP = 10
    results = []
    done_count = 0
    pending_run = []
    order = []  # keys in case order, to rebuild results at the end
    by_key = {}
    for case in cases:
        k = _key(case)
        order.append(k)
        if k in done:
            by_key[k] = done[k]
            done_count += 1
            print(f"resume: already OK {k}", flush=True)
        else:
            pending_run.append(case)

    def _flush(partial=True):
        res_list = [by_key[k] for k in order if k in by_key]
        return _write_results(res_list, tag, partial=partial)

    groups = [
        pending_run[i: i + GROUP]
        for i in range(0, len(pending_run), GROUP)
    ]
    ncases = len(cases)
    for g, group in enumerate(groups):
        print(
            f"[group {g + 1}/{len(groups)}] "
            + ", ".join(_label(c) for c in group),
            flush=True,
        )
        if not wait_relay():
            for case in group:
                by_key[_key(case)] = {**case, "status": "RELAY_DOWN"}
            _flush()
            continue
        got = {}
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--cases",
                 json.dumps(group)],
                capture_output=True, text=True,
                timeout=1200 + 1200 * len(group),
                cwd="/root/repo",
            )
            stdout = proc.stdout
        except subprocess.TimeoutExpired as e:
            stdout = (e.stdout or b"")
            if isinstance(stdout, bytes):
                stdout = stdout.decode("utf-8", "replace")
        for line in stdout.splitlines():
            if line.startswith("HWPAR "):
                res = json.loads(line[len("HWPAR "):])
                got[_key(res)] = res
        for case in group:
            k = _key(case)
            if k in got:
                by_key[k] = got[k]
                print(f"    {_label(case)} -> {got[k]['status']}",
                      flush=True)
            else:
                # Group died before this case reported (Mosaic SIGABRT /
                # timeout): isolate it in its own process.
                print(f"    {_label(case)} missing from group; "
                      f"re-running solo", flush=True)
                if not wait_relay():
                    by_key[k] = {**case, "status": "RELAY_DOWN"}
                else:
                    by_key[k] = _run_one(case)
                print(f"    {_label(case)} -> {by_key[k]['status']}",
                      flush=True)
            _flush()
        print(
            f"  progress: {sum(1 for k in order if k in by_key)}/{ncases}",
            flush=True,
        )

    out = _flush(partial=False)
    print(json.dumps(out["summary"]))
    bad = [
        r for r in out["results"]
        if r["status"] not in ("OK", "SKIP")
    ]
    for r in bad:
        print("FAILED:", json.dumps(r))
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
