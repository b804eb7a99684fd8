"""Inheritance-aware CLI flag parity diff vs the reference.

Extracts every JCommander ``@Parameter`` name reachable from each
reference command's args class — walking ``extends`` chains and
``@ParametersDelegate`` fields (cmd/AbstractCmdArgs.java:15-17 pulls
the shared CommonArgs into every command) — and diffs them against the
option strings our argparse subcommands actually accept.

Usage:
    python scripts/flag_parity.py            # human-readable diff
    python scripts/flag_parity.py --json     # machine-readable

The test twin (tests/test_cli_surface.py::test_reference_flag_parity)
asserts the missing set is empty, so PARITY.md's claim stays checkable.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REF = Path("/root/reference/colormipsearch-tools/src/main/java/"
           "org/janelia/colormipsearch")

# reference command name -> Cmd class, per generation
# (cmd/Main.java:25-36, cmd_v2/Main.java:26-52)
V3_DIR = REF / "cmd"
V2_DIR = REF / "cmd_v2"


def _strip_comments(text: str) -> str:
    text = re.sub(r"/\*.*?\*/", "", text, flags=re.S)
    return re.sub(r"//[^\n]*", "", text)


def _balanced(text: str, start: int) -> str:
    """Return the text of the parenthesized group starting at
    text[start] == '('."""
    depth, i = 0, start
    while i < len(text):
        c = text[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return text[start + 1:i]
        elif c == '"':  # skip string literals
            i += 1
            while i < len(text) and text[i] != '"':
                i += 2 if text[i] == "\\" else 1
        i += 1
    raise ValueError("unbalanced parens")


def _parameter_names(java_text: str) -> list[dict]:
    """All @Parameter annotations in a file: [{names: [...], required}]."""
    out = []
    for m in re.finditer(r"@Parameter\s*\(", java_text):
        body = _balanced(java_text, m.end() - 1)
        nm = re.search(r"names\s*=\s*\{([^}]*)\}", body)
        if nm:
            names = re.findall(r'"([^"]+)"', nm.group(1))
        else:
            nm = re.search(r'names\s*=\s*"([^"]+)"', body)
            names = [nm.group(1)] if nm else []
        if names:
            out.append({
                "names": names,
                "required": bool(re.search(r"required\s*=\s*true", body)),
            })
    return out


def _delegate_types(java_text: str) -> list[str]:
    return re.findall(
        r"@ParametersDelegate\s+(?:final\s+)?(\w+)", java_text)


def _class_files(pkg_dir: Path) -> dict[str, Path]:
    return {p.stem: p for p in pkg_dir.glob("*.java")}


def _superclass(java_text: str, cls: str) -> str | None:
    m = re.search(
        rf"class\s+{re.escape(cls)}\s+extends\s+(\w+)", java_text)
    return m.group(1) if m else None


def _args_class_of_cmd(cmd_file_text: str) -> str | None:
    """The nested `static class XyzArgs extends ...` of a Cmd file."""
    m = re.search(r"static\s+class\s+(\w*Args)\s+extends\s+(\w+)",
                  cmd_file_text)
    return m.group(1) if m else None


def reference_commands(pkg_dir: Path) -> dict[str, str]:
    """command name -> Cmd class from the package's Main.java."""
    main = _strip_comments((pkg_dir / "Main.java").read_text())
    return {m.group(2): m.group(1) for m in re.finditer(
        r"new\s+(\w+)\(\s*\"(\w+)\"", main)}


def reference_flags(pkg_dir: Path, cmd_class: str) -> dict:
    """All @Parameter specs reachable from a command's args class."""
    files = _class_files(pkg_dir)
    text = _strip_comments(files[cmd_class].read_text())
    params: list[dict] = []
    seen_classes: set[str] = set()

    def walk(cls: str, cls_text: str):
        if cls in seen_classes:
            return
        seen_classes.add(cls)
        params.extend(_parameter_names(cls_text))
        for d in _delegate_types(cls_text):
            if d in files and d not in seen_classes:
                walk(d, _strip_comments(files[d].read_text()))
        sup = _superclass(cls_text, cls)
        if sup and sup in files and sup not in seen_classes:
            walk(sup, _strip_comments(files[sup].read_text()))

    args_cls = _args_class_of_cmd(text)
    if args_cls is None:
        return {"params": [], "args_class": None}
    # the nested args class lives in the Cmd file; collect the file's
    # annotations then walk the explicit superclass chain
    params.extend(_parameter_names(text))
    seen_classes.add(cmd_class)
    sup = _superclass(text, args_cls)
    while sup and sup in files:
        sup_text = _strip_comments(files[sup].read_text())
        walk(sup, sup_text)
        sup = _superclass(sup_text, sup)
    # delegates declared in the Cmd file itself
    for d in _delegate_types(text):
        if d in files:
            walk(d, _strip_comments(files[d].read_text()))
    # dedupe by primary name
    uniq = {}
    for p in params:
        uniq.setdefault(p["names"][0], p)
    return {"params": list(uniq.values()), "args_class": args_cls}


def our_flags() -> dict[str, set[str]]:
    """subcommand -> set of accepted option strings (incl. top-level)."""
    from colormipsearch_tpu.cli.main import build_parser

    p = build_parser()
    top = {s for a in p._actions for s in a.option_strings}
    out: dict[str, set[str]] = {}
    for a in p._actions:
        if hasattr(a, "choices") and isinstance(a.choices, dict):
            for name, subp in a.choices.items():
                out[name] = top | {s for act in subp._actions
                                   for s in act.option_strings}
    return out


# flags the reference declares but that are intentionally NOT carried
# over, each with the reason (kept separate from "missing")
WAIVED: dict[str, dict[str, str]] = {}


def compute_diff() -> dict:
    ours = our_flags()
    report: dict = {"commands": {}, "missing_total": 0}
    for pkg_dir in (V3_DIR, V2_DIR):
        for cmd_name, cmd_class in reference_commands(pkg_dir).items():
            ref = reference_flags(pkg_dir, cmd_class)
            our = None
            # v2 and v3 both register under the reference names; our CLI
            # also accepts the typo alias for normalize
            for candidate in (cmd_name,
                              {"mormalizeGradientScores":
                               "normalizeGradientScores"}.get(cmd_name)):
                if candidate and candidate in ours:
                    our = ours[candidate]
                    break
            entry = {"args_class": ref["args_class"],
                     "ref_flag_count": len(ref["params"]),
                     "missing": [], "partial": [], "waived": []}
            for p in ref["params"]:
                absent = [n for n in p["names"] if n not in our]
                if not absent:
                    continue
                waiver = WAIVED.get(cmd_name, {}).get(p["names"][0])
                if waiver:
                    entry["waived"].append(
                        {"names": p["names"], "reason": waiver})
                elif len(absent) == len(p["names"]):
                    entry["missing"].append(p["names"])
                else:
                    # some aliases accepted, some not — still a gap
                    entry["partial"].append(absent)
            report["commands"][cmd_name] = entry
            report["missing_total"] += (len(entry["missing"])
                                        + len(entry["partial"]))
    return report


def main() -> int:
    report = compute_diff()
    if "--json" in sys.argv:
        print(json.dumps(report, indent=2))
    else:
        for cmd, entry in report["commands"].items():
            status = ("OK" if not entry["missing"] else
                      f"{len(entry['missing'])} MISSING")
            print(f"{cmd:42s} [{entry['ref_flag_count']:3d} ref flags] "
                  f"{status}")
            for names in entry["missing"]:
                print(f"    missing: {', '.join(names)}")
            for w in entry["waived"]:
                print(f"    waived:  {', '.join(w['names'])} "
                      f"({w['reason']})")
        print(f"\ntotal missing: {report['missing_total']}")
    return 1 if report["missing_total"] else 0


if __name__ == "__main__":
    sys.exit(main())
