#!/usr/bin/env python
"""Time-series inference entry point: built-up probability per dated frame
(the reference's time_series_inference_single_frame.py, de-bit-rotted) or
ensemble population time series (the time_series_inference.ipynb workflow).

Built-up mode — frames.json lists dated single-frame rasters:
  {"s2": [{"date": "2023-10-01", "path": "S2_20231001.tif"}, ...],
   "s1_desc": [...], "s1_asc": [...]}
  python popcorn-timeseries / run_timeseries.py builtup --frames frames.json --out-dir builtup/

Population mode — steps.json lists (label, data_root, region) steps:
  [{"label": "2020", "data_root": "/data/2020", "region": "cod"}, ...]
  python popcorn-timeseries / run_timeseries.py population --steps steps.json \
      -r m1 m2 m3 m4 m5 -S1 -S2 -NIR -occmodel -senbuilds --out-dir ts/
"""

import argparse
import json
import sys


def main():
    from ..utils import apply_platform_env, enable_compile_cache

    apply_platform_env()
    enable_compile_cache()  # $POPCORN_COMPILE_CACHE opt-in
    mode = sys.argv[1] if len(sys.argv) > 1 else ""
    argv = sys.argv[2:]
    if mode == "builtup":
        p = argparse.ArgumentParser(prog="run_timeseries.py builtup")
        p.add_argument("--frames", required=True)
        p.add_argument("--out-dir", required=True)
        p.add_argument("--patchsize", type=int, default=1024)
        p.add_argument("--overlap", type=int, default=64)
        p.add_argument("--no-nir", action="store_true")
        p.add_argument(
            "--spatial", action="store_true",
            help="spatially partition each whole frame over all devices "
            "(rows sharded on a 'data' mesh, XLA halo exchange) instead of "
            "overlap-stitched patches — for pods/multi-chip hosts",
        )
        a = p.parse_args(argv)

        from popcorn_tpu.compat.torch_convert import load_popcorn_from_dda
        from popcorn_tpu.config import ModelConfig
        from popcorn_tpu.infer.timeseries import (
            Frame,
            find_closest_frames,
            parse_date,
            run_builtup_timeseries,
        )

        with open(a.frames) as f:
            spec = json.load(f)

        def frames(key):
            return [Frame(parse_date(r["date"]), r["path"]) for r in spec.get(key, [])]

        mcfg = ModelConfig(nir=not a.no_nir)
        _, consts = load_popcorn_from_dda(mcfg)
        pairs = find_closest_frames(frames("s2"), frames("s1_desc"), frames("s1_asc"))
        mesh = None
        if a.spatial:
            from popcorn_tpu.dist.mesh import make_mesh

            mesh = make_mesh()
        written = run_builtup_timeseries(
            consts, mcfg, pairs, a.out_dir,
            patchsize=a.patchsize, overlap=a.overlap, mesh=mesh,
        )
        for w in written:
            print("->", w)
    elif mode == "population":
        from popcorn_tpu.cli.args import eval_parser, model_config_from_args
        from popcorn_tpu.config import DataPaths
        from popcorn_tpu.infer.evaluator import load_member
        from popcorn_tpu.infer.pop_timeseries import run_population_timeseries

        p = eval_parser()
        p.add_argument("--steps", required=True)
        p.add_argument("--out-dir", required=True)
        a = p.parse_args(argv)
        mcfg = model_config_from_args(a)
        with open(a.steps) as f:
            steps_spec = json.load(f)
        members, consts = [], None
        for c in a.resume:
            params, member_consts = load_member(c)
            members.append(params)
            consts = consts or member_consts
        if consts is None:
            from popcorn_tpu.compat.torch_convert import load_popcorn_from_dda

            _, consts = load_popcorn_from_dda(mcfg)
        steps = [
            (s["label"], DataPaths(s["data_root"]), s["region"]) for s in steps_spec
        ]
        records = run_population_timeseries(
            members, consts, mcfg, steps, a.out_dir,
            fourseasons=a.fourseasons, patch_batch=a.patch_batch,
        )
        for r in records:
            print(r)
    else:
        print(__doc__)
        raise SystemExit("usage: run_timeseries.py {builtup|population} ...")


