"""PatchPerPix (PPP) raw result ingestion.

Parses the PPP pipeline's `cov_scores_<em>.json` files — nested
{emName: {lmName: rawSkeletonMatch}} maps with numpy-printed array
strings — into PPPMatch entities, mirroring
ppp/RawPPPMatchesReader.java:36-90 and the EM/LM name parsing of
model/PPPMatchEntity.java:17-19,195-215.
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Iterable

from colormipsearch_tpu.model import (
    EMNeuron,
    LMNeuron,
    PPPMatch,
    PPPSkeletonMatch,
)

EM_NAME_RE = re.compile(r"([0-9]+)-([^-]*)-(.*)", re.IGNORECASE)
LM_NAME_RE = re.compile(r"(.+)_REG_UNISEX_(.+)", re.IGNORECASE)
OBJECTIVE_RE = re.compile(r"\d+x", re.IGNORECASE)
DEFAULT_OBJECTIVE = "40x"


def _parse_np_list(s: str | None) -> list:
    """Parse numpy-printed or JSON list strings like
    '[  379  5477]' or '[1.5, 0.93]' or '[[31, 245, 16], ...]'."""
    if not s:
        return []
    s = s.strip()
    if not s.startswith("["):
        return []
    try:
        return json.loads(s)
    except json.JSONDecodeError:
        pass
    # numpy print format: whitespace-separated, possibly multi-line
    inner = s.strip("[]")
    if "[" in inner:  # nested lists in numpy format
        return [json.loads("[" + p + "]")
                for p in re.findall(r"\[([^\]]*)\]", s[1:-1])]
    vals = inner.split()
    out = []
    for v in vals:
        try:
            out.append(int(v))
        except ValueError:
            try:
                out.append(float(v))
            except ValueError:
                pass
    return out


def read_raw_ppp_matches(path, *, only_best_matches: bool = True,
                         include_skeletons: bool = False) -> list[PPPMatch]:
    """One cov_scores file -> PPPMatch list (RawPPPMatchesReader:36-79)."""
    with open(path) as f:
        doc = json.load(f)
    out: list[PPPMatch] = []
    for em_name, lm_map in doc.items():
        for lm_name, raw in lm_map.items():
            m = PPPMatch(
                source_em_name=em_name,
                source_lm_name=lm_name,
                coverage_score=raw.get("cov_score"),
                aggregate_coverage=raw.get("aggregate_coverage"),
                mirrored=bool(raw.get("mirrored", False)),
                rank=raw.get("rank"),
            )
            if include_skeletons:
                prefix = "" if only_best_matches else "all_"
                ids = _parse_np_list(raw.get(prefix + "skel_ids")
                                     or raw.get("skel_ids"))
                nblast = _parse_np_list(raw.get(prefix + "nblast_scores")
                                        or raw.get("nblast_scores"))
                covs = _parse_np_list(raw.get(prefix + "coverages")
                                      or raw.get("coverages"))
                colors = _parse_np_list(raw.get(prefix + "colors")
                                        or raw.get("colors"))
                if len(ids) != len(nblast):
                    raise ValueError(
                        f"{path}: skeleton ids and nblast scores counts "
                        f"differ for {em_name}->{lm_name}")
                for i, sid in enumerate(ids):
                    m.skeleton_matches.append(PPPSkeletonMatch(
                        id=str(sid),
                        nblast_score=nblast[i] if i < len(nblast) else None,
                        coverage=covs[i] if i < len(covs) else None,
                        color=colors[i] if i < len(colors) else None))
            out.append(m)
    return out


def em_neuron_from_ppp_name(em_name: str, *, library=None,
                            alignment_space=None) -> EMNeuron:
    """'1599747200-PFNp_c-RT_18U' -> EM neuron (body id, type)."""
    n = EMNeuron(library_name=library, alignment_space=alignment_space)
    m = EM_NAME_RE.match(em_name)
    if m:
        n.published_name = m.group(1)
        n.neuron_type = m.group(2)
    else:
        n.published_name = em_name
    return n


def lm_neuron_from_ppp_name(lm_name: str, *, library=None,
                            alignment_space=None,
                            anatomical_area: str | None = None) -> LMNeuron:
    """'BJD_115G11_AE_01-20190507_62_F1_REG_UNISEX_40x' -> LM neuron.

    A suffix equal to `anatomical_area` is the area, not an objective
    (ImportPPPResultsCmd.updateLMMetadata:371-380)."""
    n = LMNeuron(library_name=library, alignment_space=alignment_space)
    m = LM_NAME_RE.match(lm_name)
    base = m.group(1) if m else lm_name
    objective = m.group(2) if m else None
    if objective and anatomical_area and \
            objective.lower() == anatomical_area.lower():
        objective = None
    elif objective and not OBJECTIVE_RE.fullmatch(objective):
        objective = DEFAULT_OBJECTIVE
    n.objective = objective
    parts = base.split("-", 1)
    n.published_name = parts[0]
    n.internal_line_name = parts[0]
    if len(parts) > 1:
        n.slide_code = parts[1]
    return n


def find_ppp_result_files(dirs: Iterable[str], *,
                          prefix: str = "cov_scores_",
                          sub_dir: str | None = None) -> list[Path]:
    """Locate <prefix>*.json files under the given directories
    (ImportPPPResultsCmd walks em-subdirectories; --matches-prefix /
    --neuron-matches-sub-dir restrict the scan to the PPP pipeline's
    per-neuron results subdirectory)."""
    out: list[Path] = []
    for d in dirs:
        p = Path(d)
        if p.is_file():
            out.append(p)
        elif p.is_dir():
            hits = sorted(p.rglob(f"{prefix}*.json"))
            if sub_dir:
                hits = [h for h in hits if sub_dir in h.parent.parts]
            out.extend(hits)
    return out


# PPP screenshot suffix -> screenshot-type key, as serialized in
# PPPMatchEntity.sourceImageFiles (model/PPPScreenshotType.java:5-27);
# declaration order matters: findScreenshotType takes the FIRST suffix
# match, so _5_ch.png must be tested before _6_ch_skel.png etc.
SCREENSHOT_TYPES = (
    ("RAW", "_1_raw.png"),
    ("MASKED_RAW", "_2_masked_raw.png"),
    ("SKEL", "_3_skel.png"),
    ("CH", "_5_ch.png"),
    ("CH_SKEL", "_6_ch_skel.png"),
)


def find_screenshots(screenshots_dir, em_name: str, lm_name: str) -> dict:
    """Locate the per-match screenshot files.

    Mirrors ImportPPPResultsCmd.lookupScreenshots:388-396: glob
    `{emName}*{lmName}*.png` in the screenshots dir next to the results
    file and classify each hit by its FileType suffix
    (PPPMatchEntity.addSourceImageFile).  Returns {type key: path str}.
    """
    d = Path(screenshots_dir)
    if not d.is_dir():
        return {}
    out: dict = {}
    for f in sorted(d.glob(f"{em_name}*{lm_name}*.png")):
        for key, suffix in SCREENSHOT_TYPES:
            if f.name.endswith(suffix):
                out[key] = str(f)
                break
    return out


def lm_sample_name(lm_name: str) -> str:
    """LM sample name = everything before _REG_UNISEX_
    (ImportPPPResultsCmd.updateLMMetadata:371-380)."""
    m = LM_NAME_RE.match(lm_name)
    return m.group(1) if m else lm_name
