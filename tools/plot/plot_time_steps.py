"""Python-3 port of scripts/plot-time-steps.py: stacked histogram of
several stage-time files.

Usage: python tools/plot/plot_time_steps.py dmap.txt pcl.txt scan.txt [out.png]
"""
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def main():
    files = [a for a in sys.argv[1:] if not a.endswith(".png")]
    out = next((a for a in sys.argv[1:] if a.endswith(".png")),
               "time_steps_hist.png")
    components = []
    for path in files:
        with open(path) as f:
            components.append(
                [float(line.strip()) for line in f if line.strip()])
    plt.figure()
    plt.hist(components, stacked=True)
    plt.savefig(out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
