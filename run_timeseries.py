#!/usr/bin/env python
"""Time-series inference entry point — see popcorn_tpu/cli/timeseries.py
(the reference's time_series_inference_single_frame.py and
time_series_inference.ipynb workflows, de-bit-rotted)."""

from popcorn_tpu.cli.timeseries import main

if __name__ == "__main__":
    main()
