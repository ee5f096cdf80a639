"""Python-3 port of scripts/plot-total.py: histogram of the per-frame SUM
across several stage-time files.

Usage: python tools/plot/plot_total.py dmap.txt pcl.txt scan.txt [out.png]
"""
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def main():
    files = [a for a in sys.argv[1:] if not a.endswith(".png")]
    out = next((a for a in sys.argv[1:] if a.endswith(".png")), "total_hist.png")
    components = []
    for path in files:
        with open(path) as f:
            components.append(
                [float(line.strip()) for line in f if line.strip()])
    total = [sum(c[i] for c in components) for i in range(len(components[0]))]
    plt.hist(total)
    plt.savefig(out)
    print("AVG: " + str(sum(total) / len(total)))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
