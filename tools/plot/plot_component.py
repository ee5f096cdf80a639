"""Python-3 port of the reference's scripts/plot-component.py: histogram of
one stage-time file (one float per line) plus the mean.

Usage: python tools/plot/plot_component.py dmap_times.txt [out.png]
"""
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def main():
    with open(sys.argv[1]) as f:
        times = [float(line.strip()) for line in f if line.strip()]
    plt.hist(times)
    out = sys.argv[2] if len(sys.argv) > 2 else "component_hist.png"
    plt.savefig(out)
    print("AVG: " + str(sum(times) / len(times)))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
