#!/usr/bin/env python
"""Dated single-frame GEE exports for built-up time-series analysis.

Native re-build of utils/download_gee_country_single_frame_gaza.py:
exports one S2 frame per date plus same/next-day S1 frames per orbit.
Frame dates come from a JSON config {"S2": [...], "S1desc": [...],
"S1asc": [...]}.

Example:
  python tools/download_gee_single_frame.py --region gaza \
      --bbox 34.2 31.2 34.6 31.6 --frames frames.json
"""
import argparse, json, os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from popcorn_tpu.acquisition.gee import download_single_frames


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--region", required=True)
    p.add_argument("--bbox", nargs=4, type=float, required=True)
    p.add_argument("--frames", required=True, help="JSON of frame dates")
    args = p.parse_args()
    with open(args.frames) as f:
        frame_dates = json.load(f)
    tasks = download_single_frames(args.region, tuple(args.bbox), frame_dates)
    print(f"submitted {len(tasks)} export tasks")


if __name__ == "__main__":
    main()
