"""BM/SGM disparity accuracy vs the libelas goldens (VERDICT r3 item 2).

The composed north-star target (BASELINE.json) couples ">=500 fps/chip"
with "disparity RMSE <= 0.5 px vs libelas" in one sentence. ELAS meets the
accuracy clause bit-exactly; this tool measures where the FAST engines
(BM, SGM) actually sit relative to the same libelas goldens, so the
composed target is finally evaluated on one path. Run on the golden
fixture scenes (tests/fixtures/elas_golden_*.npz — produced by an
instrumented out-of-tree build of the reference libelas,
tools/make_golden_fixtures.py).

Metrics per (engine, scene):
  - rmse_px: RMSE over pixels valid in BOTH maps;
  - joint_valid: fraction of pixels valid in both;
  - mask_agree: fraction of pixels whose validity flag matches;
  - gt2px: fraction of jointly-valid pixels with |err| > 2 px.
"""
import json
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SCENES = ("elas_golden_s640_boxes", "elas_golden_photo")


def compare(D, ref):
    both = (D >= 0) & (ref >= 0)
    err = D[both] - ref[both]
    return {
        "rmse_px": float(np.sqrt(np.mean(err ** 2))) if both.any() else float("nan"),
        "joint_valid": float(both.mean()),
        "mask_agree": float(np.mean((D >= 0) == (ref >= 0))),
        "gt2px": float(np.mean(np.abs(err) > 2.0)) if both.any() else float("nan"),
    }


def main():
    import jax.numpy as jnp
    from jackal_tpu.config import BMParams, SGMParams
    from jackal_tpu.matching.bm import bm_match_batch
    from jackal_tpu.matching.sgm import sgm_match_batch

    results = {}
    for scene in SCENES:
        z = np.load(os.path.join(ROOT, "tests/fixtures", scene + ".npz"))
        left = jnp.asarray(z["left"][None])
        right = jnp.asarray(z["right"][None])
        ref = z["D1"]
        for name, fn in (
            ("bm64", lambda: bm_match_batch(left, right, BMParams(disp_num=64))[0][0]),
            ("bm256", lambda: bm_match_batch(left, right, BMParams(disp_num=256))[0][0]),
            ("sgm128", lambda: sgm_match_batch(left, right, SGMParams(disp_num=128))[0][0]),
        ):
            D = np.asarray(fn())
            results[f"{name}/{scene.split('_')[-1]}"] = compare(D, ref)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    sys.exit(main())
