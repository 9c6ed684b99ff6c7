"""Score the reference's committed golden tracker output end-to-end.

Reads the 542 frames of real RaTrack result dumps the reference commits
under src/result/4dmot_runthis/delft_1 (format of src/main_utils.py:166-184),
re-identifies the detections with the offline Kalman tracker
(ratrack_tpu.eval.run_kf) and scores them with the recall-swept
point-set-IoU MOT metrics (ratrack_tpu.eval.mot_metrics), using the dumps'
own track ids as GT. Records the scorer output to GOLDEN_EVAL.json so the
offline eval stack has a committed real-data anchor
(tests/test_real_data.py pins the same numbers).

Usage: python tools/eval_golden.py [--golden DIR] [--out GOLDEN_EVAL.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from ratrack_tpu.eval.export import parse_frame_results          # noqa: E402
from ratrack_tpu.eval.mot_metrics import integrated_mot         # noqa: E402
from ratrack_tpu.eval.run_kf import retrack_clip                # noqa: E402

DEFAULT_GOLDEN = "/root/reference/src/result/4dmot_runthis/delft_1"


def score_golden(golden_dir: str, min_hits: int = 4, max_age: int = 8,
                 match_dist: float = 2.0, iou: float = 0.25) -> dict:
    names = sorted(n for n in os.listdir(golden_dir) if n.endswith(".txt"))
    frames = [parse_frame_results(os.path.join(golden_dir, n))
              for n in names]
    gt = [{int(tid): pts for _, tid, pts in f} for f in frames]
    tracked = retrack_clip(frames, min_hits=min_hits, max_age=max_age,
                           match_dist=match_dist)
    m = integrated_mot(gt, tracked, iou_thres=iou)
    return {
        "source": golden_dir,
        "n_frames": len(frames),
        "n_gt_tracks": len({tid for f in frames for _, tid, _ in f}),
        "kf_params": {"min_hits": min_hits, "max_age": max_age,
                      "match_dist": match_dist, "iou": iou},
        "metrics": {k: round(float(v), 6) for k, v in m.items()
                    if not isinstance(v, dict)},
    }


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--golden", default=DEFAULT_GOLDEN)
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "GOLDEN_EVAL.json"))
    args = p.parse_args(argv)
    result = score_golden(args.golden)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")
    print(json.dumps(result["metrics"]))


if __name__ == "__main__":
    main()
