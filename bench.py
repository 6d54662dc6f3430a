"""Driver entry: one JSON line benchmark (see lstc_vad_tpu/benchmark.py)."""

from lstc_vad_tpu.benchmark import main

if __name__ == "__main__":
    main()
