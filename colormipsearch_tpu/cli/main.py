"""Command-line entry point.

One multi-command CLI covering both reference generations
(cmd/Main.java:25-36 v3 commands, cmd_v2/Main.java:26-52 v2 commands)
with the same subcommand and flag names, FS (JSON) storage backend.
"""

from __future__ import annotations

import argparse
import logging
import sys

from colormipsearch_tpu.cli import commands


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="colormipsearch-tpu",
        description="TPU-native color depth MIP search")
    p.add_argument("--cacheSize", type=int, default=0,
                   help="target image cache size (images)")
    p.add_argument("-v", "--verbose", action="store_true")
    sub = p.add_subparsers(dest="command", required=True)

    def add(name, fn, configure, help=None, aliases=()):
        sp = sub.add_parser(name, help=help, aliases=list(aliases))
        configure(sp)
        sp.set_defaults(func=fn)
        return sp

    # ---- v3 commands (cmd/Main.java:25-36) ----
    add("colorDepthSearch", commands.cmd_color_depth_search,
        commands.configure_color_depth_search,
        help="all-pairs color depth search (pixel-match pass)")
    add("gradientScores", commands.cmd_gradient_scores,
        commands.configure_gradient_scores,
        help="gradient/shape rescoring of existing matches")
    # the reference registers the normalize command with this typo'd name
    # (cmd/Main.java:29); accept both spellings
    add("normalizeGradientScores", commands.cmd_normalize_scores,
        commands.configure_normalize_scores,
        aliases=["mormalizeGradientScores"],
        help="re-normalize gradient scores per mask")
    add("createColorDepthSearchDataInput", commands.cmd_create_data_input,
        commands.configure_create_data_input,
        help="create neuron metadata input from a library of images")

    # ---- v2 commands (cmd_v2/Main.java:26-52) ----
    add("searchFromJSON", commands.cmd_search_from_json,
        commands.configure_search_from_json,
        help="v2 search using JSON MIP lists")
    add("searchLocalFiles", commands.cmd_search_local_files,
        commands.configure_search_local_files,
        help="v2 search over local image files/zips")
    add("mergeResults", commands.cmd_merge_results,
        commands.configure_merge_results,
        help="merge per-mask result files across libraries")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    logging.basicConfig(
        level=logging.DEBUG if args.verbose else logging.INFO,
        format="%(asctime)s %(levelname).1s %(name)s %(message)s")
    return args.func(args) or 0


if __name__ == "__main__":
    sys.exit(main())
