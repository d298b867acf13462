#!/usr/bin/env python
"""Evaluate / render MonoCap checkpoints (TPU-native equivalent of
/root/reference/render_monocap.py) — delegates to the shared eval driver with
the MonoCap reader and per-sequence best iterations."""
from __future__ import annotations

import sys

import render_zju


def main():
    argv = sys.argv[1:]
    if "--reader" not in argv:
        argv += ["--reader", "monocap"]
    if "--subjects" not in argv and "--sequences" not in argv:
        argv += ["--subjects", "olek_images0812", "lan_images620", "marc_images35000",
                 "vlad_images1011"]
    if "--iterations" not in argv:
        argv += ["--iterations", "3000", "3000", "2500", "2500"]
    if "--output" not in argv:
        argv += ["--output", "output/monocap"]
    sys.argv = [sys.argv[0]] + argv
    args = render_zju.parse_args()
    for subject, iteration in zip(args.subjects, args.iterations):
        render_zju.render_subject(args, subject, iteration)


if __name__ == "__main__":
    main()
