#!/usr/bin/env python
"""Four-stage production pipeline chained at dress scale (VERDICT r5 #4).

One scripted run of the REAL CLI stages on one synthetic
production-shaped corpus, FS mode:

    colorDepthSearch -> gradientScores -> normalizeGradientScores
                     -> exportData (EM_CD_MATCHES)

mirroring the reference pipeline (README.md:381-397: search, gradient
scoring, normalization, NeuronBridge export).  After the chain:

  * normalized scores in the final per-mask files are re-verified
    against the oracle formula (GradientAreaGapUtils.java:225-244)
    from the raw (pix, gap, highExpression) values and per-mask maxima;
  * the NeuronBridge export JSON is parsed and schema-checked.

Per-stage wall clock is reported and written to
bench_runs/pipeline_dress_<ts>.json.

Env knobs: PIPE_MASKS (default 1024), PIPE_TARGETS (1024),
PIPE_TOPK (300, the production top-lines rescoring budget,
cdsparams.sh:56-66).
"""

from __future__ import annotations

import io
import json
import os
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/colormipsearch_tpu/jax"))

FIX = ("/root/reference/colormipsearch-api/src/test/resources/"
       "colormipsearch/api/cdsearch")
MASK_TIF = f"{FIX}/1752016801-LPLC2-RT_18U.tif"
TARGET_TIF = (f"{FIX}/GMR_31G04_AE_01-20190813_66_F3-40x-Brain-"
              "JRC2018_Unisex_20x_HR-2704505419467849826-CH2-07_CDM.tif")

M = int(os.environ.get("PIPE_MASKS", 1024))
T = int(os.environ.get("PIPE_TARGETS", 1024))
TOPK = int(os.environ.get("PIPE_TOPK", 300))


def run_cli(*argv) -> None:
    from colormipsearch_tpu.cli.main import main as cli_main

    rc = cli_main([str(a) for a in argv])
    assert rc == 0, f"CLI failed ({rc}): {argv}"


N_BASES = 4  # shared base rolls -> each mask matches ~T/N_BASES targets


def synth_corpus(tmp: str):
    """On-disk corpus: M EM-named masks, T LM targets with grad/zgap
    variants (identical variant content byte-copied — the decode cost
    is real, the synthesis cheap).

    Masks and targets share N_BASES base rolls (+ <=1 px per-item
    jitter, inside the xyShift 2 search window): mask i strongly
    matches every target with the same base — so the search stage
    produces production-shaped match lists (~T/N_BASES per mask,
    trimmed by --nBestLines like the reference's top-300 rescoring
    budget) instead of random-roll noise."""
    import concurrent.futures

    from PIL import Image

    from colormipsearch_tpu.io.image import read_image
    from colormipsearch_tpu.oracle.shape import dilate_rgb, mask_rgb as mfn

    mask_rgb = read_image(MASK_TIF).as_rgb()
    target_rgb = read_image(TARGET_TIF).as_rgb()
    h, w = mask_rgb.shape[:2]
    rng = np.random.default_rng(9)
    bases = [(0, 0)] + [(int(rng.integers(0, h)), int(rng.integers(0, w)))
                        for _ in range(N_BASES - 1)]
    m_jit = rng.integers(-1, 2, (M, 2))
    t_jit = rng.integers(-1, 2, (T, 2))
    t_rolls = [(int(rng.integers(0, h)), int(rng.integers(0, w)))
               for _ in range(T)]
    masks_dir = os.path.join(tmp, "masks")
    targets_dir = os.path.join(tmp, "targets")
    grad_dir = os.path.join(targets_dir, "grad")
    zgap_dir = os.path.join(targets_dir, "zgap")
    for d in (masks_dir, targets_dir, grad_dir, zgap_dir):
        os.makedirs(d)

    def write_mask(i):
        # EM-style numeric body-id names so the EM export groups by
        # publishedName (MIPsHandlingUtils EM body-id parsing)
        b = bases[i % N_BASES]
        t_img = np.roll(mask_rgb, (b[0] + int(m_jit[i, 0]),
                                   b[1] + int(m_jit[i, 1])), axis=(0, 1))
        Image.fromarray(t_img).save(
            os.path.join(masks_dir, f"{900000000 + i}-RT_18U.tif"),
            compression="packbits")

    grad = rng.integers(0, 400, (h, w)).astype(np.uint16)
    grad_buf = io.BytesIO()
    Image.fromarray(grad).save(grad_buf, format="PNG")
    grad_bytes = grad_buf.getvalue()
    zg_cache: dict[int, bytes] = {}

    def write_target(i):
        # composite: a randomly-rolled LM CDM plus the EM mask pattern
        # at this target's base roll — the "same neuron seen in LM"
        # construction that makes base-matched pairs score high
        b = bases[i % N_BASES]
        t_img = np.maximum(
            np.roll(target_rgb, t_rolls[i], axis=(0, 1)),
            np.roll(mask_rgb, (b[0] + int(t_jit[i, 0]),
                               b[1] + int(t_jit[i, 1])), axis=(0, 1)))
        name = f"t{i:05d}_CDM"
        Image.fromarray(t_img).save(
            os.path.join(targets_dir, name + ".tif"),
            compression="packbits")
        open(os.path.join(grad_dir, name + "_grad.png"), "wb") \
            .write(grad_bytes)
        key = i // 256
        if key not in zg_cache:
            zg = dilate_rgb(mfn(t_img, 20), 20)
            buf = io.BytesIO()
            Image.fromarray(zg).save(buf, format="PNG")
            zg_cache[key] = buf.getvalue()
        open(os.path.join(zgap_dir, name + "_zgap.png"), "wb") \
            .write(zg_cache[key])

    with concurrent.futures.ThreadPoolExecutor(4) as pool:
        list(pool.map(write_mask, range(M)))
    for i in range(T):  # zgap dilation per 256 keeps this cheap
        write_target(i)
    return masks_dir, targets_dir, grad_dir, zgap_dir


def verify_normalized(out_norm: str) -> int:
    """Re-verify normalizedScore in the chained output against the
    oracle formula from the raw row values (the cross-stage round-trip
    check).  Returns rows checked."""
    from colormipsearch_tpu.oracle.shape import normalized_score

    n = 0
    files = sorted(os.listdir(out_norm))
    for fn in files:
        if not fn.endswith(".json") or fn == "cdsParameters.json":
            continue
        doc = json.load(open(os.path.join(out_norm, fn)))
        rows = [r for r in doc.get("results", ())
                if (r.get("gradientAreaGap") or -1) >= 0]
        if not rows:
            continue
        max_pix = max(r["matchingPixels"] for r in rows)
        max_neg = max(r["gradientAreaGap"]
                      + (r.get("highExpressionArea") or 0) // 2
                      for r in rows)
        for r in rows:
            want = normalized_score(
                r["matchingPixels"], r["gradientAreaGap"],
                r.get("highExpressionArea") or 0, max_pix, max_neg)
            got = r["normalizedScore"]
            assert abs(got - want) < 1e-6 * max(1.0, abs(want)), (
                fn, r["image"]["mipId"], got, want)
            n += 1
    return n


def verify_export(exp_dir: str) -> int:
    """Parse + schema-check the NeuronBridge export."""
    n = 0
    for fn in sorted(os.listdir(exp_dir)):
        if not fn.endswith(".json"):
            continue
        doc = json.load(open(os.path.join(exp_dir, fn)))
        assert doc["inputImage"]["type"] == "EMImage", fn
        assert doc["inputImage"]["publishedName"] == fn[:-5], fn
        for r in doc["results"]:
            assert r["type"] == "CDSMatch"
            assert r["image"]["type"] == "LMImage"
            assert isinstance(r["normalizedScore"], (int, float))
            assert "mirrored" in r
            n += 1
    return n


def main() -> int:
    stages: dict[str, float] = {}
    with tempfile.TemporaryDirectory() as tmp:
        t0 = time.perf_counter()
        masks_dir, targets_dir, grad_dir, zgap_dir = synth_corpus(tmp)
        stages["synth"] = time.perf_counter() - t0

        # stage 0: data inputs (masks; targets with variant lookup so
        # the shape stage finds GradientImage/ZGapImage computeFiles)
        t0 = time.perf_counter()
        run_cli("createColorDepthSearchDataInput", "-i", masks_dir,
                "-l", "flyem_dress", "--alignment-space",
                "JRC2018_Unisex_20x_HR", "-od", tmp,
                "--output-filename", "m.json")
        run_cli("createColorDepthSearchDataInput", "-i", targets_dir,
                "-l", "flylight_dress", "--alignment-space",
                "JRC2018_Unisex_20x_HR",
                "--gradients-location", grad_dir,
                "--gradient-suffix", "_grad",
                "--zgap-location", zgap_dir, "--zgap-suffix", "_zgap",
                "-od", tmp, "--output-filename", "t.json")
        stages["dataInput"] = time.perf_counter() - t0

        # stage 1: pixel search (production params)
        out_cds = os.path.join(tmp, "cds")
        t0 = time.perf_counter()
        run_cli("colorDepthSearch", "-m", os.path.join(tmp, "m.json"),
                "-i", os.path.join(tmp, "t.json"),
                "--maskThreshold", 20, "--dataThreshold", 20,
                "--pixColorFluctuation", 1.0, "--xyShift", 2,
                "--mirrorMask", "--pctPositivePixels", 1.0,
                "-od", out_cds, "--perMaskSubdir", "pm")
        stages["colorDepthSearch"] = time.perf_counter() - t0

        # stage 2: gradient scores over the top-K of each mask (the
        # production rescoring budget), decode-once packed store
        out_gs = os.path.join(tmp, "gs")
        store = os.path.join(tmp, "pack")
        t0 = time.perf_counter()
        run_cli("gradientScores", "--matches",
                os.path.join(out_cds, "pm"), "-od", out_gs,
                "--maskThreshold", 20, "--mirrorMask",
                "--nBestLines", TOPK,
                "--packed-variants-store", store)
        stages["gradientScores"] = time.perf_counter() - t0

        # stage 3: re-normalization pass over the scored files
        out_norm = os.path.join(tmp, "norm")
        t0 = time.perf_counter()
        run_cli("normalizeGradientScores", "--matches", out_gs,
                "-od", out_norm)
        stages["normalizeGradientScores"] = time.perf_counter() - t0

        # stage 4: NeuronBridge export
        out_exp = os.path.join(tmp, "export")
        t0 = time.perf_counter()
        run_cli("exportData", "--exported-result-type", "EM_CD_MATCHES",
                "--matches", out_norm, "-od", out_exp)
        stages["exportData"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        n_norm = verify_normalized(out_norm)
        n_exp = verify_export(out_exp)
        stages["verify"] = time.perf_counter() - t0
        assert n_norm > 0, "no normalized rows to verify"
        assert n_exp > 0, "no exported rows"

        result = {
            "masks": M, "targets": T, "top_k": TOPK,
            "stages_s": {k: round(v, 1) for k, v in stages.items()},
            "chain_wall_s": round(sum(
                v for k, v in stages.items()
                if k not in ("synth", "verify")), 1),
            "normalized_rows_verified": n_norm,
            "exported_rows_verified": n_exp,
        }
    os.makedirs(os.path.join(REPO, "bench_runs"), exist_ok=True)
    path = os.path.join(REPO, "bench_runs",
                        f"pipeline_dress_{time.strftime('%Y%m%dT%H%M%S')}.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    result["saved"] = path
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
