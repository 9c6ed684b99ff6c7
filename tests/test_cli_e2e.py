"""End-to-end CLI test over an on-disk VoD fixture tree.

Exercises the entire production path in-process: config load → VoD file
parsing → GT assembly → training epochs (with checkpoint saves) → eval
restore → per-frame result export → offline MOT scoring — the full
reference workflow (`python main.py --config ...` for both YAMLs),
including the orbax round-trip the reference lacks.
"""

import os

import numpy as np
import pytest
import yaml


@pytest.mark.slow
def test_vod_train_then_eval_cli(tmp_path):
    from ratrack_tpu.data.fixture import make_vod_fixture
    from ratrack_tpu.data.pipeline import CLIP_RANGES
    from ratrack_tpu.main import main

    root = str(tmp_path / "vod")
    # fixture frames for one train clip (delft_2) and one val clip
    # (delft_10); the clips_dir override restricts both splits to 6 frames
    first_tr, _ = CLIP_RANGES["delft_2"]
    first_va, _ = CLIP_RANGES["delft_10"]
    make_vod_fixture(root, range(first_tr, first_tr + 6))
    make_vod_fixture(root, range(first_va, first_va + 6))
    clips_dir = str(tmp_path / "clips")
    os.makedirs(clips_dir)
    for clip, first in [("delft_2", first_tr), ("delft_10", first_va)]:
        with open(os.path.join(clips_dir, clip + ".txt"), "w") as f:
            f.write("\n".join(str(i) for i in range(first, first + 6)))
    for clip in ["delft_3", "delft_4", "delft_6", "delft_9", "delft_11",
                 "delft_12", "delft_13", "delft_19", "delft_23", "delft_24",
                 "delft_26", "delft_27", "delft_1", "delft_14", "delft_22"]:
        open(os.path.join(clips_dir, clip + ".txt"), "w").close()

    common = dict(model="track4d_radar", dataset="vod", dataset_path=root,
                  clips_dir=clips_dir, n_max=96, npoints=96, k_max=8,
                  g_max=8, sinkhorn_iters=20, min_obj_points=2,
                  checkpoints_dir=str(tmp_path / "ckpt"),
                  results_dir=str(tmp_path / "results"))
    train_cfg = dict(common, exp_name="e2e", epochs=2, pretrain_epochs=1,
                     lr=0.002)
    eval_cfg = dict(common, exp_name="e2e", eval=True, load_checkpoint=True)

    tr_path = str(tmp_path / "train.yaml")
    ev_path = str(tmp_path / "eval.yaml")
    yaml.safe_dump(train_cfg, open(tr_path, "w"))
    yaml.safe_dump(eval_cfg, open(ev_path, "w"))

    main(["--config", tr_path, "--cpu"])
    models_dir = os.path.join(common["checkpoints_dir"], "e2e", "models")
    assert os.path.isdir(os.path.join(models_dir, "last"))
    assert os.path.isdir(os.path.join(models_dir, "best"))
    assert os.path.exists(os.path.join(common["checkpoints_dir"], "e2e",
                                       "loss_history.csv"))

    main(["--config", ev_path, "--cpu"])
    res_clip = os.path.join(common["results_dir"], "delft_10")
    assert os.path.isdir(res_clip)
    files = sorted(os.listdir(res_clip))
    assert len(files) == 5          # 6 frames → 5 frame pairs
    # run.log got the MOT table
    log = open(os.path.join(common["checkpoints_dir"], "e2e",
                            "run.log")).read()
    assert "SAMOTA" in log
    assert "FINISH" in log

    # reference-.t7 checkpoint loading: the reference's eval flow points
    # model_path at a torch file (src/models/model.py:28-37); the CLI
    # must accept one through the weight converter
    import torch
    from test_convert import _TorchTrack4D
    t7_path = str(tmp_path / "model.last.t7")
    torch.save(_TorchTrack4D().state_dict(), t7_path)
    t7_cfg = dict(eval_cfg, model_path=t7_path,
                  results_dir=str(tmp_path / "results_t7"))
    t7_yaml = str(tmp_path / "eval_t7.yaml")
    yaml.safe_dump(t7_cfg, open(t7_yaml, "w"))
    main(["--config", t7_yaml, "--cpu"])
    log = open(os.path.join(common["checkpoints_dir"], "e2e",
                            "run.log")).read()
    assert "converted reference checkpoint" in log
    assert os.path.isdir(os.path.join(t7_cfg["results_dir"], "delft_10"))

    # vis on the SCAN path: vis_dir no longer forces the per-frame path
    # (the scan outputs carry labels/ids/warp; BEV renders post-hoc)
    vis_cfg = dict(eval_cfg, scan_frames=4,
                   vis_dir=str(tmp_path / "vis"),
                   results_dir=str(tmp_path / "results_vis"))
    vis_path = str(tmp_path / "eval_vis.yaml")
    yaml.safe_dump(vis_cfg, open(vis_path, "w"))
    main(["--config", vis_path, "--cpu"])
    vis_clip = os.path.join(vis_cfg["vis_dir"], "delft_10")
    assert os.path.isdir(vis_clip)
    pngs = [f for f in os.listdir(vis_clip) if f.endswith(".png")]
    assert len(pngs) == 5
    log = open(os.path.join(common["checkpoints_dir"], "e2e",
                            "run.log")).read()
    assert "[eval/scan]" in log     # the scan path actually ran


def test_shipped_configs_parse():
    """Every checked-in configs/*.yaml loads through Config with no
    unknown-key warnings (catches config/key drift — the loader only
    warns, so a typo'd key silently falls back to the default)."""
    import glob
    import warnings

    from ratrack_tpu.config import load_config

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    paths = sorted(glob.glob(os.path.join(repo, "configs", "*.yaml")))
    assert len(paths) >= 7
    for p in paths:
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            cfg = load_config(p)
        assert cfg.n_max >= cfg.npoints > 0, p
        assert cfg.scan_frames >= 0, p
