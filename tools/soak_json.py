#!/usr/bin/env python3
"""JSON-metadata mutation differential soak (VERDICT r4 #1/#9).

Every prior soak built metadata through example_*_metadata generators —
the JSON *text* was never mutated. This soak mutates the serialized
container/frame JSON bytes and runs BOTH CLIs (the compiled reference
example and `python -m mcraw`) on the resulting clip, comparing the
observable contract:

  - reference rc==0           -> byte parity required (stdout + every
                                 output file), EXCEPT the documented
                                 short-array-UB tightening (reference
                                 OOB-reads garbage into the DNG; ours
                                 must fail with the MetadataError for
                                 that key).
  - reference clean error     -> byte parity of stdout/stderr/files and
    (rc==255, "Error: ...")      nonzero exit from us too.
  - reference abort (SIGABRT  -> we must fail CLEANLY: nonzero rc,
    via terminate/assert, or     stderr starting "Error: ", no
    other fatal signal)          traceback, and stdout identical up to
                                 the fault.

Anything else (we succeed where the reference fails, we traceback, we
emit different bytes) dumps a reproducer and counts as a FAIL.

Mutation menu (applied to container or frame JSON, 1-2 per iteration):
  text-level:  truncation, random byte flip, garbage insertion,
               trailing garbage, NaN/Infinity/overflow literal splices,
               duplicate-key insertion;
  tree-level:  drop key, retype value (str/null/bool/array/object),
               numeric edge (huge ints spanning the int64/uint64/double
               lexer boundaries, float width, negative), short/long
               arrays, wrong-element-type arrays.

Usage: python tools/soak_json.py [seconds] (default 300)
"""

import json
import os
import random
import shutil
import subprocess
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

REPO = str(Path(__file__).resolve().parents[1])


def _text_mutations(rng):
    """Byte-level mutators: (name, fn(bytes) -> bytes)."""

    def truncate(b):
        return b[: rng.integers(0, len(b) + 1)]

    def flip(b):
        if not b:
            return b
        i = int(rng.integers(0, len(b)))
        return b[:i] + bytes([int(rng.integers(32, 127))]) + b[i + 1:]

    def insert(b):
        i = int(rng.integers(0, len(b) + 1))
        tok = random.choice(
            [b"}", b"{", b"[", b",", b'"', b"\\", b"\x00", b"\xff",
             b"NaN", b"Infinity", b"1e999", b"//c", b"  "]
        )
        return b[:i] + tok + b[i:]

    def trailing(b):
        return b + random.choice([b"x", b" {}", b"null", b"\x01"])

    def dup_key(b):
        # naive text-level duplicate: replay the first "key": chunk at
        # the end of the object (last one wins in both parsers)
        try:
            obj = json.loads(b)
        except Exception:
            return b
        if not isinstance(obj, dict) or not obj:
            return b
        k = random.choice(list(obj))
        s = b.decode()
        if not s.rstrip().endswith("}"):
            return b
        val = random.choice(["1", '"x"', "null", "[1]", "3.5"])
        j = s.rstrip()[:-1] + ', "%s": %s}' % (k, val)
        return j.encode()

    return [
        ("truncate", truncate),
        ("flip", flip),
        ("insert", insert),
        ("trailing", trailing),
        ("dup_key", dup_key),
    ]


def _tree_mutations(rng):
    """Structured mutators over the parsed dict."""

    def drop_key(d):
        if d:
            d.pop(random.choice(list(d)))
        return d

    def retype(d):
        if not d:
            return d
        k = random.choice(list(d))
        d[k] = random.choice(
            ["str", None, True, False, [1, 2], {"x": 1}, ""]
        )
        return d

    def numeric_edge(d):
        if not d:
            return d
        k = random.choice(list(d))
        d[k] = random.choice(
            [
                (1 << 32) + 5, (1 << 63) - 1, 1 << 63, (1 << 64) - 1,
                1 << 64, (1 << 64) + 192, -(1 << 63), -(1 << 63) - 1,
                10**300, -7, 0, 192.7, 1e308,
            ]
        )
        return d

    def array_edit(d):
        keys = [k for k, v in d.items() if isinstance(v, list)]
        if not keys:
            return d
        k = random.choice(keys)
        v = list(d[k])
        mode = rng.integers(0, 4)
        if mode == 0 and v:
            v = v[: int(rng.integers(0, len(v)))]  # short
        elif mode == 1:
            v = v + v[:3]  # long (defined: extras ignored by reference)
        elif mode == 2 and v:
            v[int(rng.integers(0, len(v)))] = "oops"  # element retype
        else:
            v = []
        d[k] = v
        return d

    return [
        ("drop_key", drop_key),
        ("retype", retype),
        ("numeric_edge", numeric_edge),
        ("array_edit", array_edit),
    ]


def mutate_json(rng, blob: bytes) -> tuple[bytes, list[str]]:
    names = []
    n = int(rng.integers(1, 3))
    for _ in range(n):
        if rng.integers(0, 2) == 0:
            name, fn = random.choice(_text_mutations(rng))
            blob = fn(blob)
        else:
            try:
                obj = json.loads(blob)
            except Exception:
                name, fn = random.choice(_text_mutations(rng))
                blob = fn(blob)
                names.append(name)
                continue
            if not isinstance(obj, dict):
                continue
            name, fn = random.choice(_tree_mutations(rng))
            blob = json.dumps(fn(obj)).encode()
        names.append(name)
    return blob, names


def run_case(workdir, clip_bytes, ref_exe):
    clip = os.path.join(workdir, "clip.mcraw")
    with open(clip, "wb") as f:
        f.write(clip_bytes)
    ref_dir = os.path.join(workdir, "ref")
    my_dir = os.path.join(workdir, "mine")
    os.makedirs(ref_dir)
    os.makedirs(my_dir)
    # text=False: nlohmann parse errors echo the offending raw bytes on
    # stderr, which need not be valid UTF-8. Decode with replacement.
    ref = subprocess.run(
        [ref_exe, clip], cwd=ref_dir, capture_output=True, timeout=120,
    )
    env = {**os.environ, "PYTHONPATH": REPO, "JAX_PLATFORMS": "cpu"}
    mine = subprocess.run(
        [sys.executable, "-m", "mcraw", "decode", clip,
         "--backend", "numpy"],
        cwd=my_dir, capture_output=True, timeout=300, env=env,
    )
    for p in (ref, mine):
        p.stdout = p.stdout.decode("utf-8", "replace")
        p.stderr = p.stderr.decode("utf-8", "replace")
    return ref, mine, ref_dir, my_dir


def classify(ref, mine, ref_dir, my_dir, geom_mismatch=False):
    """Return None if the contract holds, else a failure reason.

    geom_mismatch: the mutated frame JSON's (width, height) — parsed
    with OUR nlohmann-semantics conversions — no longer matches the
    payload's encoded geometry. The reference's behavior there is the
    documented truncation/overflow UB family: it may "succeed" off
    stale buffers (RawData_Legacy.cpp:473 uninitialized refs), abort,
    or stumble into an accidental clean error whose text depends on
    int-overflow wraps (e.g. width = 2^64 -> INT_MIN -> memcpy size
    wraps to 0 -> negative return -> "Failed to uncompress frame").
    Our uniform clean failure is the pinned tightening
    (tests/test_json_parity.py), so for these cases a clean failure on
    our side satisfies the contract regardless of the reference's
    stderr text or UB-success."""
    ref_files = sorted(os.listdir(ref_dir))
    my_files = sorted(os.listdir(my_dir))

    def files_equal():
        if ref_files != my_files:
            return f"file sets differ: {ref_files} vs {my_files}"
        for n in ref_files:
            a = open(os.path.join(ref_dir, n), "rb").read()
            b = open(os.path.join(my_dir, n), "rb").read()
            if a != b:
                return f"file bytes differ: {n}"
        return None

    clean_ours = (
        mine.returncode != 0
        and mine.stderr.startswith("Error: ")
        and "Traceback" not in mine.stderr
    )

    # Heap-corruption fault signatures: the reference OVERFLOWED (e.g.
    # metadata height below the payload's encodedHeight makes Decode
    # write past outData, RawData.cpp:598-608) — undefined behavior, so
    # there is nothing defined to match. Our behavior for these inputs
    # is pinned separately (crop semantics / clean errors); here we only
    # require that we didn't traceback.
    UB_SIGNATURES = (
        "munmap_chunk", "double free", "free():", "malloc():",
        "Segmentation fault", "stack smashing", "corrupted",
    )
    # SIGSEGV/SIGBUS/SIGFPE are never defined behavior — UB class even
    # with an empty stderr (observed: silent rc=-11 segfaults).
    if ref.returncode in (-11, -7, -8) or (
        ref.returncode not in (0, 255)
        and any(s in ref.stderr for s in UB_SIGNATURES)
    ):
        if mine.returncode == 0 or clean_ours:
            return None
        return f"our failure not clean: stderr={mine.stderr[:200]!r}"

    if ref.returncode == 0:
        if mine.returncode == 0:
            if mine.stdout != ref.stdout:
                return "stdout differs on mutual success"
            return files_equal()
        # Allowed tightenings: reference OOB-reads short arrays into the
        # DNG (UB "success") -> our short-array MetadataError; and
        # payload-mismatched geometry (UB truncation family) -> our
        # clean codec/geometry error.
        if clean_ours and "expected >=" in mine.stderr:
            return None
        if clean_ours and geom_mismatch:
            return None
        return (
            f"we failed where reference succeeded: rc={mine.returncode} "
            f"stderr={mine.stderr[:200]!r}"
        )
    if ref.returncode == 255:  # clean "Error:" exit -1 path
        if mine.returncode == 0:
            return "we succeeded where reference cleanly failed"
        if mine.stdout != ref.stdout:
            return "clean-error stdout parity failed"
        if mine.stderr != ref.stderr:
            if clean_ours and geom_mismatch:
                return None  # accidental-clean-UB text (see docstring)
            return "clean-error byte parity failed"
        return files_equal()
    # Abort class (SIGABRT etc. — negative rc from signal)
    if mine.returncode == 0:
        if geom_mismatch:
            return None  # ref UB-decoded then died later; we cropped
        return "we succeeded where reference aborted"
    if not clean_ours:
        return f"our failure not clean: stderr={mine.stderr[:200]!r}"
    if mine.stdout != ref.stdout:
        if geom_mismatch:
            # Fault STAGE legitimately differs: we stop at the decode
            # (truncation error) where the reference UB-"succeeds" the
            # decode off stale buffers and dies later (e.g. a missing
            # writeDng key) — after printing its "Writing ..." line.
            return None
        return "stdout-prefix parity failed on abort case"
    return None


def main():
    budget_s = float(sys.argv[1]) if len(sys.argv) > 1 else 300.0
    from mcraw import encode as E
    from mcraw.metadata import (
        example_container_metadata,
        example_frame_metadata,
    )
    from tools import ref_shim

    ref_exe = ref_shim.build_example()
    assert ref_exe, "reference example unavailable"

    seed = int(time.time()) % (1 << 31)
    rng = np.random.default_rng(seed)
    random.seed(seed)
    print(f"soak_json: seed={seed} budget={budget_s}s", flush=True)

    img = np.random.default_rng(3).integers(
        0, 4096, size=(16, 192), dtype=np.uint16
    )
    payload7 = bytes(E.encode_modern(img))
    payload6 = bytes(E.encode_legacy(img))

    t0 = time.time()
    iters = fails = 0
    outdir = Path(__file__).parent
    while time.time() - t0 < budget_s:
        iters += 1
        codec = 7 if rng.integers(0, 2) == 0 else 6
        cm = json.dumps(example_container_metadata()).encode()
        fm = json.dumps(example_frame_metadata(192, 16, codec)).encode()
        target = "container" if rng.integers(0, 2) == 0 else "frame"
        if target == "container":
            cm, names = mutate_json(rng, cm)
        else:
            fm, names = mutate_json(rng, fm)
        w = E.ContainerWriter(cm)
        w.add_frame(1000, payload7 if codec == 7 else payload6, fm)
        w.add_audio(np.zeros(256, np.int16), 0)
        blob = w.finish()

        # Does the mutated frame JSON still describe the real payload
        # geometry? (See classify's geom_mismatch contract.)
        gm = False
        if target == "frame":
            try:
                from mcraw.metadata import FrameMetadata, parse_metadata_json

                fparsed = FrameMetadata(parse_metadata_json(fm))
                gm = (fparsed.width, fparsed.height) != (192, 16)
            except Exception:
                gm = False  # unparseable/unconvertible: both CLIs fail

        workdir = tempfile.mkdtemp(prefix="soakjson_")
        try:
            try:
                ref, mine, ref_dir, my_dir = run_case(workdir, blob, ref_exe)
                reason = classify(ref, mine, ref_dir, my_dir,
                                  geom_mismatch=gm)
            except subprocess.TimeoutExpired as e:
                # A wedged binary on a mutated clip is itself a finding;
                # record it and keep soaking (the whole input domain is
                # pathological — one hang must not kill the budget).
                # EXCEPT: the REFERENCE grinding >120s on payload-
                # mismatched geometry is its resource-exhaustion UB
                # (observed: width = -(2^63)-1 -> INT_MIN, height = -7
                # -> a multi-GB zero-filling resize) — our side rejects
                # the same metadata instantly; nothing to match.
                ref = mine = None
                timed_out_ref = str(e.cmd[0]).endswith("ref_example")
                if timed_out_ref and gm:
                    print(f"  note iter={iters}: reference resource-"
                          f"exhaustion timeout on mismatched geometry "
                          f"(allowed UB class)", flush=True)
                    reason = None
                else:
                    reason = f"timeout: {e.cmd[:2]}"
            if reason is not None:
                fails += 1
                dump = outdir / f"soak_json_fail_{iters}.json"
                dump.write_text(json.dumps({
                    "seed": seed, "iter": iters, "target": target,
                    "codec": codec, "mutations": names, "reason": reason,
                    "cmeta": cm.decode("latin1"),
                    "fmeta": fm.decode("latin1"),
                    "ref_rc": ref.returncode if ref else None,
                    "ref_out": ref.stdout if ref else None,
                    "ref_err": ref.stderr[-400:] if ref else None,
                    "my_rc": mine.returncode if mine else None,
                    "my_out": mine.stdout if mine else None,
                    "my_err": mine.stderr[-400:] if mine else None,
                }, indent=1))
                print(f"FAIL iter={iters} {target} {names}: {reason} "
                      f"-> {dump}", flush=True)
        finally:
            shutil.rmtree(workdir, ignore_errors=True)
        if iters % 50 == 0:
            print(f"  {iters} iters, {fails} fails, "
                  f"{time.time() - t0:.0f}s", flush=True)

    print(f"soak_json: DONE {iters} iters, {fails} fails")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
