"""Data layer: synthetic fixture files through each reader + eval parity
against a numpy transcription of the reference's eval_multi."""
import os
import pickle
import types

import numpy as np
import pytest

from zedo_tpu.data import (
    DATASETS, CustomDataset, H36MDataset3D, MPII3DHP, PW3D, flip_data,
    mini_rgbd, skiPose, syrip, unflip_data,
)
from zedo_tpu.data import evaluation, sharding
from zedo_tpu.data.prep import mini_process


def _make_h36m_pkl(path, n=12, seed=0):
    rng = np.random.RandomState(seed)
    items = []
    for i in range(n):
        j3d = rng.randn(17, 3).astype(np.float64) * 300 + [0, 0, 4000]  # mm
        items.append(
            {
                "joint_3d_camera": j3d,
                "joint_3d_image": rng.rand(17, 3).astype(np.float64) * 1000,
                "camera_param": {
                    "fx": np.array(1145.0), "fy": np.array(1144.0),
                    "cx": np.array(512.0), "cy": np.array(515.0),
                },
                "image_path": f"img_{i}.jpg",
                "action": 2 + (i % 15),
            }
        )
    with open(path, "wb") as f:
        pickle.dump(items, f)
    return items


def _ref_eval_multi_h36m(preds, items, protocol2):
    """Numpy transcription of h36m.py:365-442."""
    from zedo_tpu.ops.procrustes import align_to_gt
    import jax.numpy as jnp

    results = []
    for idx, multi_pred in enumerate(preds):
        multi = []
        for pred in multi_pred:
            gt = items[idx]["joint_3d_camera"]
            gt = (gt - gt[0:1]) / 1000.0
            if protocol2:
                pred = np.asarray(align_to_gt(jnp.asarray(pred), jnp.asarray(gt)))
            multi.append(np.mean(np.sqrt(np.square(pred - gt).sum(axis=1))))
        results.append(np.amin(multi))
    results = np.array(results)
    action_index = {i: [] for i in range(2, 17)}
    for idx, item in enumerate(items):
        action_index[item["action"]].append(idx)
    finals = [np.mean(results[v]) for i, v in action_index.items() if len(v)]
    return float(np.mean(finals))


def test_h36m_reader_and_eval(tmp_path, rng):
    items = _make_h36m_pkl(tmp_path / "h36m_test.pkl")
    ds = H36MDataset3D(str(tmp_path), "test", gt2d=True, abs_coord=True)
    assert ds.db_2d.shape == (12, 17, 3)
    assert ds.db_3d.shape == (12, 17, 3)
    assert ds.camera_param.shape == (12, 3, 3)
    # abs_coord keeps absolute (non-centered) meters
    np.testing.assert_allclose(
        ds.db_3d[0], items[0]["joint_3d_camera"] / 1000.0, rtol=1e-5
    )
    d2, d3 = ds[0]
    assert d2.shape == (17, 3) and d3.shape == (17, 3)

    preds = np.stack(
        [ds.db_3d - ds.db_3d[:, 0:1] + rng.randn(12, 17, 3).astype(np.float32) * 0.03
         for _ in range(3)],
        axis=1,
    )  # [N, S=3, 17, 3]
    for protocol2 in (False, True):
        got = ds.eval_multi(preds, protocol2=protocol2, print_verbose=True)
        want = _ref_eval_multi_h36m(preds, items, protocol2)
        np.testing.assert_allclose(got, want, rtol=1e-4)
    # single-hypothesis eval
    got1 = ds.eval(preds[:, 0], protocol2=False)
    want1 = _ref_eval_multi_h36m(preds[:, :1], items, False)
    np.testing.assert_allclose(got1, want1, rtol=1e-4)


def test_h36m_detected_2d(tmp_path, rng):
    _make_h36m_pkl(tmp_path / "h36m_test.pkl")
    dt = {
        "test": {
            "joint3d_image": rng.rand(12, 17, 3).astype(np.float32) * 1000,
            "confidence": rng.rand(12, 17, 1).astype(np.float32),
        }
    }
    with open(tmp_path / "h36m_sh_dt_ft.pkl", "wb") as f:
        pickle.dump(dt, f)
    ds = H36MDataset3D(str(tmp_path), "test", gt2d=False, abs_coord=True)
    cond, conf, k = ds.arrays()
    assert conf is not None and conf.shape == (12, 17)
    np.testing.assert_allclose(conf, dt["test"]["confidence"][..., 0], rtol=1e-6)


def test_h36m_sample_interval(tmp_path):
    _make_h36m_pkl(tmp_path / "h36m_test.pkl")
    ds = H36MDataset3D(str(tmp_path), "test", gt2d=True, sample_interval=3)
    assert len(ds.db_2d) == 4 and len(ds.gt_dataset) == 4 and len(ds.actions) == 4


def test_eval_sample_interval_strides_gt_too(tmp_path, rng):
    """eval(sample_interval=k) must score strided preds against the SAME
    strided GT items (the reference strides only preds and then indexes
    full-length GT — h36m.py:285-307 — which crashes/mispairs)."""
    items = _make_h36m_pkl(tmp_path / "h36m_test.pkl")
    ds = H36MDataset3D(str(tmp_path), "test", gt2d=True, abs_coord=True)
    gt = np.array([i["joint_3d_camera"] for i in items])
    gt = ((gt - gt[:, 0:1]) / 1000.0).astype(np.float32)
    preds = gt + 0.01
    e = ds.eval(preds, protocol2=False, sample_interval=3)
    assert abs(e - 0.01 * np.sqrt(3)) < 1e-4
    e2 = ds.eval_multi(preds[:, None], protocol2=False, sample_interval=3)
    assert abs(e2 - 0.01 * np.sqrt(3)) < 1e-4


def test_pw3d_reader_and_eval(tmp_path, rng):
    n = 10
    kp3d = rng.randn(n, 17, 3).astype(np.float32) * 0.3
    root = np.zeros((n, 3), np.float32)
    root[:, 2] = 5.0
    np.savez(
        tmp_path / "pw3d_test.npz",
        keypoints3d17_relative=kp3d,
        root_cam=root,
        cam_param=np.array(
            {"f": np.full((n, 2), 1000.0), "c": np.full((n, 2), 500.0)}, dtype=object
        ),
        image_width=np.full(n, 1000),
        image_height=np.full(n, 1000),
        image_path=np.array([f"im{i}" for i in range(n)]),
    )
    ds = PW3D(str(tmp_path), "test", gt2d=False, abs_coord=True)
    assert ds.db_3d.shape == (n, 17, 3)
    # 2D synthesized from 3D projection regardless of gt2d (pw3d.py:211-212)
    z = ds.db_3d[..., 2:]
    np.testing.assert_allclose(
        ds.db_2d[..., 0], (ds.db_3d[..., 0] * 1000 / z[..., 0] + 500), rtol=1e-4
    )
    # joint reorder roundtrip: order_change is a permutation
    perm = np.array(ds.order_change(np.arange(17)[:, None]))[:, 0]
    assert sorted(perm.tolist()) == list(range(17))

    preds = (ds.db_3d - ds.db_3d[:, 0:1])[:, None] + 0.02
    e17 = ds.eval_multi(preds, protocol2=False)
    assert abs(e17 - 0.02 * np.sqrt(3)) < 1e-4
    e14 = ds.eval_multi(preds, protocol2=False, joint=14)
    assert abs(e14 - 0.02 * np.sqrt(3)) < 1e-4
    epa = ds.eval_multi(preds, protocol2=True)
    assert epa < 1e-5  # constant offset removed by alignment


def test_pw3d_seq5678_eval_gt_selection(tmp_path, rng):
    """seq5678 selects the h36m-format gt_dataset as the single-hypothesis
    eval GT source; without it the h36m_test.pkl fallback loads from the
    dataset root (pw3d.py:239-248)."""
    import pickle

    n = 6
    kp3d = rng.randn(n, 17, 3).astype(np.float32) * 0.3
    root = np.zeros((n, 3), np.float32)
    root[:, 2] = 5.0
    np.savez(
        tmp_path / "pw3d_test.npz",
        keypoints3d17_relative=kp3d,
        root_cam=root,
        cam_param=np.array(
            {"f": np.full((n, 2), 1000.0), "c": np.full((n, 2), 500.0)},
            dtype=object,
        ),
        image_width=np.full(n, 1000),
        image_height=np.full(n, 1000),
        image_path=np.array([f"im{i}" for i in range(n)]),
    )
    items = [
        {"joint_3d_camera": rng.randn(17, 3) * 200 + [0, 0, 4000],
         "action": 2 + (i % 3)}
        for i in range(n)
    ]
    with open(tmp_path / "h36m_test.pkl", "wb") as f:
        pickle.dump(items, f)

    gt = np.array([it["joint_3d_camera"] for it in items])
    gt = (gt - gt[:, 0:1]) / 1000.0
    preds = gt + 0.02

    # fallback path: no seq5678 -> loads h36m_test.pkl from the root
    ds = PW3D(str(tmp_path), "test", gt2d=False, abs_coord=True)
    e = ds.eval(preds, protocol2=False)
    assert abs(e - 0.02 * np.sqrt(3)) < 1e-4

    # seq5678 path: the caller-populated gt_dataset wins
    ds2 = PW3D(str(tmp_path), "test", gt2d=False, abs_coord=True,
               seq5678=True)
    ds2.gt_dataset = items
    e2 = ds2.eval(preds, protocol2=False)
    assert abs(e2 - e) < 1e-8
    # seq5678 without gt_dataset: clear error instead of the reference's
    # unset-attribute crash
    ds3 = PW3D(str(tmp_path), "test", gt2d=False, abs_coord=True,
               seq5678=True)
    with pytest.raises(ValueError):
        ds3.eval(preds)
    # seq1 accepted and inert, as in the reference
    PW3D(str(tmp_path), "test", gt2d=False, abs_coord=True, seq1=True)


def test_eval_multi_sample_interval_strides_gt_all_datasets(rng):
    """eval_multi(sample_interval=k) strides predictions AND GT together on
    every whole-set dataset (code-review r2: pw3d/ski/custom/mini/syrip
    strided preds only and crashed or mispaired)."""
    from zedo_tpu.data.custom import CustomDataset
    from zedo_tpu.data.mini_rgbd import mini_rgbd
    from zedo_tpu.data.ski import skiPose
    from zedo_tpu.data.syrip import syrip

    n = 9
    db = rng.randn(n, 17, 3).astype(np.float32) * 0.3
    preds = (db - db[:, 0:1])[:, None] + 0.02
    for cls in (PW3D, skiPose, CustomDataset):
        ds = cls.__new__(cls)
        ds.db_3d = db
        e = ds.eval_multi(preds, protocol2=False, sample_interval=3)
        assert abs(e - 0.02 * np.sqrt(3)) < 1e-4, cls.__name__
    ds = syrip.__new__(syrip)
    ds.db_3d = db - db[:, 0:1]
    ds.num_joint = 17
    e = ds.eval_multi(preds, sample_interval=3)
    assert abs(e - 0.02 * np.sqrt(3)) < 1e-4
    ds = mini_rgbd.__new__(mini_rgbd)
    ds.db_3d = db
    ds.num_joint = 17
    e = ds.eval_multi(preds, protocol2=False, sample_interval=3)
    assert np.isfinite(e)


def test_ski_reader_and_eval(tmp_path, rng):
    import h5py

    n, j = 9, 17
    with h5py.File(tmp_path / "ski_test.h5", "w") as f:
        f["seq"] = np.arange(n)
        f["cam"] = np.arange(n) % 3
        f["frame"] = np.arange(n)
        cam = np.zeros((n, 3, 3), np.float32)
        cam[:, 0, 0] = cam[:, 1, 1] = 4.0  # normalized intrinsics
        cam[:, 0, 2] = cam[:, 1, 2] = 0.5
        cam[:, 2, 2] = 1.0
        f["cam_intrinsic"] = cam
        f["3D"] = rng.randn(n, j * 3).astype(np.float32)
        f["2D"] = rng.rand(n, j * 2).astype(np.float32)
    ds = skiPose(str(tmp_path), "test", abs_coord=True)
    assert ds.camera_param[0, 0, 0] == 4.0 * 256
    assert ds.camera_param[0, 2, 2] == 1.0
    # scaled from 0..1 to pixel units: must exceed the raw range
    assert 1.0 < ds.db_2d.max() <= 256.0 + 1e-5
    preds = (ds.db_3d - ds.db_3d[:, 0:1])[:, None] + 0.01
    e = ds.eval_multi(preds)
    assert abs(e - 0.01 * np.sqrt(3)) < 1e-4


def test_mini_rgbd_reader(tmp_path, rng):
    d = {"train": {}, "validate": {}}
    for i in range(6):
        key = f"01_fr{i:04d}.txt"
        d["train"][key] = {
            "pose_2d": rng.rand(25, 2).astype(np.float32) * 400,
            "pose_3d": rng.randn(25, 3).astype(np.float32),
        }
    for i in range(4):
        key = f"11_fr{i:04d}.txt"
        d["validate"][key] = {
            "pose_2d": rng.rand(25, 2).astype(np.float32) * 400,
            "pose_3d": rng.randn(25, 3).astype(np.float32),
        }
    os.makedirs(tmp_path / "mini", exist_ok=True)
    np.save(tmp_path / "mini" / "MINI-RGBD.npy", d)
    ds = mini_rgbd(subset="train", num_joint=17, data_root=str(tmp_path / "mini"))
    assert ds.db_2d.shape == (6, 17, 2)
    assert ds.db_3d.shape == (6, 17, 3)
    d2, d3, k = ds[0]
    assert k[0, 0] > 500  # kinect fx
    ds12 = mini_rgbd(subset="validate", num_joint=12, data_root=str(tmp_path / "mini"))
    assert ds12.db_3d.shape == (4, 12, 3)
    preds = ds12.db_3d[:, None] - ds12.db_3d[:, None, 0:1] + 0.01
    e = ds12.eval_multi(preds)
    assert abs(e - 0.01 * np.sqrt(3)) < 1e-4


def test_mini_process_prep(tmp_path):
    root = tmp_path / "raw"
    for seq in ["01", "11"]:
        os.makedirs(root / seq / "joints_2Ddep")
        os.makedirs(root / seq / "joints_3D")
        for fr in range(2):
            with open(root / seq / "joints_2Ddep" / f"syn_joints_2Ddep_{fr}.txt", "w") as f:
                for j in range(25):
                    f.write(f"{j}.0 {j + 1}.0 0.5\n")
            with open(root / seq / "joints_3D" / f"syn_joints_3D_{fr}.txt", "w") as f:
                for j in range(25):
                    f.write(f"{j}.0 {j + 1}.0 {j + 2}.0\n")
    out = tmp_path / "MINI-RGBD.npy"
    d = mini_process.process(str(root), str(out))
    assert len(d["train"]) == 2 and len(d["validate"]) == 2
    key = list(d["train"])[0]
    assert d["train"][key]["pose_2d"].shape == (25, 2)
    assert d["train"][key]["pose_3d"].shape == (25, 3)
    # keys for 2d and 3d entries must line up
    assert all("pose_3d" in v and "pose_2d" in v for v in d["train"].values())


def test_custom_dataset(tmp_path, rng):
    n = 5
    np.savez(
        tmp_path / "custom_data.npz",
        keypoints_2d=rng.rand(n, 17, 3).astype(np.float32),
        keypoints_3d=rng.randn(n, 17, 3).astype(np.float32),
        K=np.broadcast_to(np.eye(3, dtype=np.float32), (n, 3, 3)).copy(),
        image_name=np.array([f"f{i}" for i in range(n)]),
    )
    ds = CustomDataset(str(tmp_path))
    assert ds.db_2d.shape == (n, 17, 3)
    preds = (ds.db_3d - ds.db_3d[:, 0:1])[:, None] + 0.05
    e = ds.eval_multi(preds)
    assert abs(e - 0.05 * np.sqrt(3)) < 1e-3


def test_flip_unflip_roundtrip(rng):
    data = rng.randn(4, 17, 3).astype(np.float32)
    doubled = flip_data(data)
    assert doubled.shape == (8, 17, 3)
    back = unflip_data(doubled.reshape(8, 17 * 3))
    np.testing.assert_allclose(back, data.reshape(4, 17 * 3), atol=1e-6)


def test_min_over_hypotheses_and_actions(rng):
    """Evaluation engine: min-then-action-mean ordering (h36m.py:409-433)."""
    gt = rng.randn(6, 17, 3).astype(np.float32)
    preds = np.stack([gt + 1.0, gt + 0.1, gt + 0.5], axis=1)  # best is S=1
    actions = np.array([2, 2, 3, 3, 4, 4])
    report = evaluation.multi_hypothesis_eval(preds, gt, actions=actions,
                                              action_order=[2, 3, 4])
    assert (report.min_hypothesis == 1).all()
    np.testing.assert_allclose(report.error, 0.1 * np.sqrt(3), rtol=1e-5)
    assert set(report.per_action) == {2, 3, 4}


def test_sharding_helpers(rng):
    chunks = sharding.contiguous_chunks(10, 4)
    assert [len(c) for c in chunks] == [3, 3, 2, 2]
    assert np.concatenate(chunks).tolist() == list(range(10))

    arrays = {"a": rng.randn(10, 17, 3), "b": None}
    padded, mask = sharding.pad_batch(arrays, 8)
    assert padded["a"].shape == (16, 17, 3)
    assert mask.sum() == 10
    np.testing.assert_array_equal(padded["a"][10:], np.repeat(arrays["a"][-1:], 6, 0))
    np.testing.assert_array_equal(sharding.unpad(padded["a"], mask), arrays["a"])


def test_dataset_registry():
    assert set(DATASETS) == {"h36m", "3dhp", "3dpw", "ski", "mini", "syrip", "wild"}


def test_mpii3dhp_reader_and_eval(tmp_path, rng):
    n = 8
    items = []
    for i in range(n):
        items.append(
            {
                "joint_3d_camera": rng.randn(17, 3) * 300 + [0, 0, 3500],
                "joint_2d": rng.rand(17, 3) * 2000,
                "w": 2048, "h": 2048,
                "camera_param": {"fx": 1500.0, "fy": 1500.0, "cx": 1017.0, "cy": 1043.0},
                "imageid": i,
                "valid_i": 1 if i % 2 == 0 else 0,
                "action": (i % 7) + 1,
            }
        )
    with open(tmp_path / "mpii3d_test.pkl", "wb") as f:
        pickle.dump(items, f)
    ds = MPII3DHP(str(tmp_path), "test", gt2d=True, abs_coord=True, sample_interval=1)
    # valid_i filter keeps even indices only (applied in _sample)
    assert len(ds.db_2d) == 4
    # actions remapped through ACTION_CONVERTOR
    from zedo_tpu.data.mpii3dhp import ACTION_CONVERTOR
    for item in ds.gt_dataset:
        assert item["action"] in ACTION_CONVERTOR
    gt = np.array([it["joint_3d_camera"] for it in ds.gt_dataset])
    gt = (gt - gt[:, 0:1]) / 1000.0
    preds = gt[:, None].astype(np.float32) + 0.02
    e = ds.eval_multi(preds, protocol2=False, print_verbose=True)
    assert abs(e - 0.02 * np.sqrt(3)) < 1e-3


def test_distributed_eval_sampler():
    class DS:
        def __len__(self):
            return 10

    ds = DS()
    seen = []
    for r in range(3):
        s = sharding.DistributedEvalSampler(ds, num_replicas=3, rank=r)
        seen += list(s)
    assert sorted(seen) == list(range(10))  # pad-free, no duplicates
    assert [len(sharding.DistributedEvalSampler(ds, 3, r)) for r in range(3)] == [4, 3, 3]
    import pytest as _pytest
    with _pytest.raises(ValueError):
        sharding.DistributedEvalSampler(ds, 3, 5)


def test_syrip_reader_and_eval(tmp_path, rng):
    import os

    root = tmp_path / "syrip"
    os.makedirs(root / "SyRIP_3d_pred")
    os.makedirs(root / "SyRIP_3d_correction")
    n = 6
    names = np.array([f"path/to/img{i:03d}.jpg" for i in range(n)])
    np.save(root / "SyRIP_3d_pred" / "output_imgnames.npy", names)
    np.save(root / "SyRIP_3d_correction" / "correct_3D.npy",
            rng.randn(n, 14, 3).astype(np.float32))  # 12 used + 2 dropped
    # name maps: first 4 train, last 2 test
    train_map = {f"img{i:03d}.jpg": [f"img{i:03d}.jpg", i] for i in range(4)}
    test_map = {f"img{i:03d}.jpg": [f"img{i:03d}.jpg", i] for i in range(4, 6)}
    np.save(root / "train_rysip.npy", train_map)
    np.save(root / "test_rysip.npy", test_map)
    pose2d = {
        f"img{i:03d}.jpg": {
            "h": 480, "w": 640, "bbox": [0, 0, 10, 10],
            "keypoints": rng.rand(17, 3).astype(np.float32) * 400,
        }
        for i in range(n)
    }
    np.save(root / "train_pose2d.npy", {k: pose2d[k] for k in list(pose2d)[:4]})
    np.save(root / "test_pose2d.npy", {k: pose2d[k] for k in list(pose2d)[4:]})

    ds = syrip(subset="train", num_joint=12, data_root=str(root))
    assert ds.db_3d.shape == (4, 12, 3)
    assert ds.db_2d.shape == (4, 12, 3)
    assert ds.K.shape == (4, 3, 3)
    assert ds.K[0, 0, 0] == 2000 and ds.K[0, 0, 2] == 320  # f=2000, cx=w/2
    # 12-joint pelvis centering: mean of joints 0 and 3 is ~0
    pelvis = (ds.db_3d[:, 0] + ds.db_3d[:, 3]) / 2
    np.testing.assert_allclose(pelvis, 0, atol=1e-6)
    d2, d3, k = ds[0]
    assert d2.shape == (12, 2) and k.sum() == 0  # zero K (syrip.py:151)

    preds = ds.db_3d[:, None] + 0.01
    e = ds.eval_multi(preds)
    assert abs(e - 0.01 * np.sqrt(3)) < 1e-4

    ds_test = syrip(subset="validate", num_joint=12, data_root=str(root))
    assert ds_test.db_3d.shape == (2, 12, 3)

    # aug=True appends prior-only 3D rows (reference syrip.py:290-310): 3D
    # grows past 2D, __getitem__ still wraps by real_data_len, and the
    # base-class alignment invariant must accept the asymmetry
    aug_path = root / "aug.npy"
    np.save(aug_path, rng.randn(3, 12, 3).astype(np.float32))
    ds_aug = syrip(subset="train", num_joint=12, data_root=str(root),
                   aug=True, aug_path=str(aug_path))
    assert len(ds_aug.db_3d) == 7 and len(ds_aug.db_2d) == 4
    assert len(ds_aug) == 7
    d2, d3, _ = ds_aug[5]  # wraps: 5 % 4 == 1
    np.testing.assert_array_equal(d3, ds_aug.db_3d[1])


def test_mpii3dhp_detected_2d_branch(tmp_path, rng):
    """dt-2D path: per-sequence npz, TS3/TS4 drop 100 frames, 16->17 joints."""
    lens = {"TS1": 6, "TS2": 5, "TS3": 104, "TS4": 103, "TS5": 4, "TS6": 3}
    d3 = {s: rng.randn(n, 16, 3).astype(np.float32) * 300 for s, n in lens.items()}
    d2 = {s: rng.rand(n, 16, 2).astype(np.float32) * 2000 for s, n in lens.items()}
    np.savez(
        tmp_path / "mpii_dt_test.npz",
        positions_3d=np.array(d3, dtype=object),
        positions_2d=np.array(d2, dtype=object),
    )
    ds = MPII3DHP(str(tmp_path), "test", gt2d=False, abs_coord=True)
    expected_n = 6 + 5 + 4 + 3 + 4 + 3  # TS3/TS4 keep len-100 frames
    assert ds.db_3d.shape == (expected_n, 17, 3)
    assert ds.db_2d.shape[1] == 17
    # slot 10 zero-filled by the 16->17 mapping
    np.testing.assert_array_equal(ds.db_3d[:, 10], 0)
    # ... and it must carry CONFIDENCE 0 while real joints carry 1: without
    # the channel the solver would weight pixel (0, 0) as a full-confidence
    # observation, biasing the shared translation least-squares every OIL
    # step (package review r4)
    _, conf, _ = ds.arrays()
    assert conf is not None, "dt branch must expose a confidence channel"
    np.testing.assert_array_equal(conf[:, 10], 0.0)
    real = np.delete(conf, 10, axis=1)
    np.testing.assert_array_equal(real, 1.0)
    # dt camera table is row-aligned with the post-drop frames: one K row per
    # surviving frame, per-sequence intrinsics (the reference built it from
    # the un-dropped totals and misaligned everything past TS3 — VERDICT r1)
    from zedo_tpu.data.mpii3dhp import MPII_K
    assert ds.camera_param.shape[0] == expected_n
    assert ds.camera_param[0, 0, 0] == np.float32(MPII_K[0]["fx"])
    # boundary check: first TS3 row (after TS1+TS2) carries TS3 intrinsics
    ts3_start = 6 + 5
    assert ds.camera_param[ts3_start, 0, 0] == np.float32(MPII_K[2]["fx"])
    assert ds.camera_param[ts3_start - 1, 0, 0] == np.float32(MPII_K[1]["fx"])
    # last row carries TS6 intrinsics
    assert ds.camera_param[-1, 0, 0] == np.float32(MPII_K[5]["fx"])
    # detected-branch eval: head joint pinned to GT, whole-set mean
    preds = ds.db_3d[:, None] + 0.02
    e = ds.eval_multi(preds, protocol2=False)
    assert np.isfinite(e)
    # arrays() hands the solver aligned tensors
    cond, conf, k = ds.arrays()
    assert len(cond) == len(k) == expected_n


def test_augment_batch_semantics(rng):
    """Vectorized batch augs match __getitem__'s per-item semantics: flips
    negate x and swap left/right on ~half the rows, rotations preserve
    joint norms, flip composes BEFORE rotation (the __getitem__ order),
    and non-train subsets pass through untouched."""
    from zedo_tpu.data.base import PoseDataset

    x = rng.randn(64, 17, 3).astype(np.float32)

    class DS(PoseDataset):
        def read_data(self):
            self.db_2d = np.zeros((64, 17, 2), np.float32)
            self.db_3d = x
            self.camera_param = None

    ds = DS(subset="train", flip=True, rot=False)
    out = ds.augment_batch(x, np.random.RandomState(0))
    flipped_ref = x.copy()
    flipped_ref[:, :, 0] *= -1
    flipped_ref[:, ds.left_joints + ds.right_joints] = flipped_ref[
        :, ds.right_joints + ds.left_joints]
    is_orig = np.all(np.isclose(out, x), axis=(1, 2))
    is_flip = np.all(np.isclose(out, flipped_ref), axis=(1, 2))
    assert np.all(is_orig | is_flip)
    assert 8 < is_flip.sum() < 56  # ~p=0.5 per row

    ds_rot = DS(subset="train", flip=False, rot=True)
    out_r = ds_rot.augment_batch(x, np.random.RandomState(1))
    np.testing.assert_allclose(  # rotations preserve per-joint norms
        np.linalg.norm(out_r, axis=-1), np.linalg.norm(x, axis=-1),
        rtol=1e-5, atol=1e-5)
    assert not np.allclose(out_r, x)  # and some rows actually rotated

    # composition order: flip applied BEFORE rotation (__getitem__ order).
    # Force every row to take both augs (rand -> 0) while the rotation
    # matrices still come from the real delegate stream, then compare
    # against rotate(flip(x)) with matrices from an identical stream.
    from scipy.spatial.transform import Rotation as ScipyRotation

    class AlwaysAug(np.random.RandomState):
        """rand() -> 0 (both augs always fire, consuming no state), every
        other draw (the rotation sampling) untouched."""

        def rand(self, *a):
            return np.zeros(a if a else (1,))

    ds_both = DS(subset="train", flip=True, rot=True)
    out_b = ds_both.augment_batch(x, AlwaysAug(7))
    mats = ScipyRotation.random(64, random_state=np.random.RandomState(7)
                                ).as_matrix().astype(np.float32)
    want = np.einsum("nij,nkj->nki", mats, flipped_ref)
    np.testing.assert_allclose(out_b, want, rtol=1e-5, atol=1e-5)

    ds_test = DS(subset="test", flip=True, rot=True)
    np.testing.assert_array_equal(
        ds_test.augment_batch(x, np.random.RandomState(2)), x)

    ds_off = DS(subset="train", flip=False, rot=False)
    np.testing.assert_array_equal(
        ds_off.augment_batch(x, np.random.RandomState(3)), x)


def test_concat_augment_batch_delegates_and_guards(rng):
    """ConcatDataset.augment_batch delegates to the first member and
    REJECTS members that disagree on the flip joint maps (a silent
    mis-augmentation otherwise)."""
    from zedo_tpu.data.base import PoseDataset
    from zedo_tpu.data.concat import ConcatDataset

    def make(cls_left=None):
        class DS(PoseDataset):
            def read_data(self):
                self.db_2d = np.zeros((8, 17, 2), np.float32)
                self.db_3d = rng.randn(8, 17, 3).astype(np.float32)
                self.camera_param = None

        ds = DS(subset="train", flip=True, rot=False)
        if cls_left is not None:
            ds.left_joints = cls_left
        return ds

    a, b = make(), make()
    concat = ConcatDataset([a, b])
    x = rng.randn(16, 17, 3).astype(np.float32)
    out = concat.augment_batch(x, np.random.RandomState(0))
    want = a.augment_batch(x, np.random.RandomState(0))
    np.testing.assert_array_equal(out, want)

    bad = ConcatDataset([make(), make(cls_left=[1, 2, 3, 4, 5, 6])])
    with pytest.raises(ValueError, match="joint maps"):
        bad.augment_batch(x, np.random.RandomState(0))


def test_train_loop_applies_batch_augs(tmp_path, rng):
    """--rotflip reaches the batches AND the augmented values are what the
    step trains on: a stubbed augment shifts the losses, and trainer's
    _wants_aug recurses into ConcatDataset members (the real --rotflip
    concat path). It used to be silently inert — package review r4."""
    import configs.optim.concat_pose_optimization_mini as mini_cfg
    from zedo_tpu.data.base import PoseDataset
    from zedo_tpu.data.concat import ConcatDataset
    from zedo_tpu.models import score_mlp
    from zedo_tpu.train import trainer

    class DS(PoseDataset):
        def read_data(self):
            self.db_2d = np.zeros((32, 17, 2), np.float32)
            self.db_3d = rng.randn(32, 17, 3).astype(np.float32) * 0.1
            self.camera_param = None

    config = mini_cfg.get_config()
    config.training.batch_size = 16
    config.model.num_scales = 20
    model_cfg = score_mlp.ScoreMLPConfig(
        n_joints=17, joint_dim=3, hidden_dim=32, embed_dim=16, n_blocks=1, group_norm_groups=8,
        embedding_type="positional", num_scales=20)

    def run(ds, out):
        _, history, _ = trainer.train_loop(
            config, ds, output_dir=str(tmp_path / out), model_cfg=model_cfg,
            trainer_cfg=trainer.TrainerConfig(n_epochs=2, eval_freq=100,
                                              seed=0))
        return history

    base_ds = DS(subset="train", flip=False, rot=False)
    h_plain = run(base_ds, "plain")

    # flags on + a distinctive stub: if the RETURN VALUE reaches the step,
    # the losses must change; a call-counting-only check would pass even if
    # the trainer discarded the augmented batch
    ds_stub = DS(subset="train", flip=True, rot=True)
    calls = []
    ds_stub.augment_batch = (
        lambda b, r: calls.append(len(b)) or (np.asarray(b) + 1.0))
    h_stub = run(ds_stub, "stub")
    assert calls == [16, 16, 16, 16]  # 2 epochs x 2 steps, every batch
    assert not np.allclose(h_stub, h_plain), (
        "augmented batches did not reach the train step")

    # real augs produce finite, different-from-plain training
    h_real = run(DS(subset="train", flip=True, rot=True), "real")
    assert np.isfinite(h_real).all()
    assert not np.allclose(h_real, h_plain)

    # concat path: _wants_aug must find the members' flags (the CLI's
    # actual --rotflip dataset is a ConcatDataset)
    m1, m2 = (DS(subset="train", flip=True, rot=False),
              DS(subset="train", flip=True, rot=False))
    concat = ConcatDataset([m1, m2])
    ccalls = []
    orig = m1.augment_batch
    m1.augment_batch = lambda b, r: ccalls.append(len(b)) or orig(b, r)
    run(concat, "concat")
    # 64 rows / batch 16 = 4 steps/epoch x 2 epochs, all delegated via m1
    assert ccalls == [16] * 8


def test_valid_ind_filters_hypotheses(rng):
    """valid_ind is honored (reference `if sec_idx not in valid_ind[idx]:
    continue`): invalidated hypotheses cannot win the min — it used to be
    accepted-and-ignored, silently reporting better errors (package review
    r4)."""
    n, s = 6, 3
    gt = rng.randn(n, 17, 3).astype(np.float32)
    preds = np.stack([gt + 0.01 * (h + 1) for h in range(s)], axis=1)
    # hypothesis 0 is always best; invalidate it for every sample
    full = evaluation.multi_hypothesis_eval(preds, gt)
    assert np.all(full.min_hypothesis == 0)
    filt = evaluation.multi_hypothesis_eval(
        preds, gt, valid_ind=[[1, 2]] * n)
    assert np.all(filt.min_hypothesis == 1)
    assert filt.error > full.error
    # boolean-mask form agrees
    mask = np.zeros((n, s), bool)
    mask[:, 1:] = True
    filt2 = evaluation.multi_hypothesis_eval(preds, gt, valid_ind=mask)
    assert filt2.error == filt.error
    with pytest.raises(ValueError, match="no valid hypothesis"):
        evaluation.multi_hypothesis_eval(preds, gt, valid_ind=[[]] * n)


def test_eval_rejects_disjoint_action_order(rng):
    """Actions entirely outside action_order raise instead of a silent
    nan headline (package review r4)."""
    gt = rng.randn(4, 17, 3).astype(np.float32)
    with pytest.raises(ValueError, match="no samples fall"):
        evaluation.multi_hypothesis_eval(
            gt[:, None] + 0.01, gt, actions=np.array([99, 99, 98, 98]),
            action_order=[2, 3, 4])


def test_mini_12_flip_maps(tmp_path, rng):
    """mini at num_joint=12 carries 12-convention flip maps (the base
    H36M-17 maps index up to 16 and would IndexError); syrip's 12-ordering
    differs, so the concat aug guard refuses the mix loudly."""
    from zedo_tpu.data.concat import ConcatDataset

    d = {"train": {}, "validate": {}}
    for i in range(6):
        d["train"][f"01_f{i}.txt"] = {
            "pose_2d": rng.rand(25, 2).astype(np.float32) * 400,
            "pose_3d": rng.randn(25, 3).astype(np.float32) * 0.1}
    np.save(tmp_path / "MINI-RGBD.npy", d)
    ds = mini_rgbd("train", num_joint=12, data_root=str(tmp_path), flip=True)
    assert ds.db_3d.shape[1] == 12
    assert max(ds.left_joints + ds.right_joints) < 12
    out = ds.augment_batch(ds.db_3d.copy(), np.random.RandomState(0))
    assert out.shape == ds.db_3d.shape  # no IndexError, valid swap maps
    # per-item path works too
    _ = ds[0]

    fake_syrip = types.SimpleNamespace(
        left_joints=[3, 4, 5, 9, 10, 11], right_joints=[0, 1, 2, 6, 7, 8],
        flip=True, rot=False)
    concat = ConcatDataset.__new__(ConcatDataset)
    concat.datasets = [ds, fake_syrip]
    with pytest.raises(ValueError, match="joint maps"):
        concat.augment_batch(ds.db_3d, np.random.RandomState(0))


def test_syrip_rejects_non_12_joint(tmp_path, rng):
    """syrip's 2D/3D only align after the CHANGE_12 reorder; any other
    num_joint is refused loudly instead of silently scrambling joint
    correspondences (the reference's default 17 does exactly that)."""
    root = tmp_path
    (root / "SyRIP_3d_correction").mkdir()
    (root / "SyRIP_3d_pred").mkdir()
    np.save(root / "SyRIP_3d_pred" / "output_imgnames.npy",
            np.array(["a/img0.jpg"]))
    np.save(root / "SyRIP_3d_correction" / "correct_3D.npy",
            rng.randn(1, 14, 3).astype(np.float32))
    np.save(root / "train_rysip.npy", {"img0.jpg": ["img0.jpg"]})
    np.save(root / "train_pose2d.npy",
            {"img0.jpg": {"keypoints": rng.rand(17, 2), "h": 100, "w": 100}})
    np.save(root / "test_pose2d.npy", {})
    with pytest.raises(ValueError, match="num_joint=12 only"):
        syrip(subset="train", num_joint=17, data_root=str(root))


def test_pad_batch_edge_inputs():
    """Empty batches and all-None dicts fail with clear errors, not
    IndexError/StopIteration (package review r4)."""
    with pytest.raises(ValueError, match="empty batch"):
        sharding.pad_batch({"a": np.zeros((0, 17, 2)), "b": None}, 8)
    with pytest.raises(ValueError, match="only None"):
        sharding.pad_batch({"a": None, "b": None}, 8)


def test_mpii3dhp_eval_requires_gt_branch(tmp_path, rng):
    """Single-hypothesis eval on the detected-2D dataset (no gt_dataset)
    raises a clear error instead of TypeError on None."""
    lens = {"TS1": 3, "TS2": 2, "TS3": 101, "TS4": 101, "TS5": 2, "TS6": 2}
    d3 = {s: rng.randn(n, 16, 3).astype(np.float32) * 300 for s, n in lens.items()}
    d2 = {s: rng.rand(n, 16, 2).astype(np.float32) * 2000 for s, n in lens.items()}
    np.savez(tmp_path / "mpii_dt_test.npz",
             positions_3d=np.array(d3, dtype=object),
             positions_2d=np.array(d2, dtype=object))
    ds = MPII3DHP(str(tmp_path), "test", gt2d=False, abs_coord=True)
    with pytest.raises(ValueError, match="GT pkl branch"):
        ds.eval(ds.db_3d[:, None][:, 0])


def test_augment_batch_cond_joint_flip(rng):
    """Conditional-training aug: the flip transforms the 3D pose AND the 2D
    condition TOGETHER (x-negate + L/R swap on both); flipped-or-not, the
    (pose, condition) pairing stays consistent row by row, and the rotation
    aug is never applied on this path (advisor r4: the 3D-only aug trained
    the conditional model on mismatched pairs)."""
    from zedo_tpu.data.base import PoseDataset

    x = rng.randn(64, 17, 3).astype(np.float32)
    c = rng.randn(64, 17, 2).astype(np.float32)

    class DS(PoseDataset):
        def read_data(self):
            self.db_2d = np.zeros((64, 17, 2), np.float32)
            self.db_3d = x
            self.camera_param = None

    ds = DS(subset="train", flip=True, rot=True)
    out3, out2 = ds.augment_batch_cond(x.copy(), c.copy(), np.random.RandomState(0))
    lr = ds.left_joints + ds.right_joints
    rl = ds.right_joints + ds.left_joints
    f3 = x.copy(); f3[:, :, 0] *= -1; f3[:, lr] = f3[:, rl]
    f2 = c.copy(); f2[:, :, 0] *= -1; f2[:, lr] = f2[:, rl]
    is_orig = np.all(np.isclose(out3, x), axis=(1, 2))
    is_flip = np.all(np.isclose(out3, f3), axis=(1, 2))
    assert np.all(is_orig | is_flip)        # NO rotation ever applied
    assert 8 < is_flip.sum() < 56           # ~p=0.5 per row
    # the condition flipped on exactly the rows where the pose flipped
    np.testing.assert_array_equal(out2[is_flip], f2[is_flip])
    np.testing.assert_array_equal(out2[is_orig], c[is_orig])

    # non-train subsets / flip off: identity on both
    for ds_id in (DS(subset="test", flip=True, rot=True),
                  DS(subset="train", flip=False, rot=True)):
        o3, o2 = ds_id.augment_batch_cond(x, c, np.random.RandomState(1))
        np.testing.assert_array_equal(o3, x)
        np.testing.assert_array_equal(o2, c)

    # length mismatch is rejected
    with pytest.raises(ValueError, match="conditions"):
        ds.augment_batch_cond(x, c[:5], np.random.RandomState(2))

    # concat delegation (same maps) works; disagreeing maps are rejected
    from zedo_tpu.data.concat import ConcatDataset

    class DS2(DS):
        pass

    concat = ConcatDataset([DS(subset="train", flip=True),
                            DS2(subset="train", flip=True)])
    o3, o2 = concat.augment_batch_cond(x, c, np.random.RandomState(0))
    w3, w2 = ds.augment_batch_cond(x, c, np.random.RandomState(0))
    np.testing.assert_array_equal(o3, w3)
    np.testing.assert_array_equal(o2, w2)

    # members without the joint-aug method fail LOUDLY through the concat:
    # a silent passthrough would defeat train_loop's augment_batch_cond
    # guard (getattr on the concat finds the concat's own method)
    class Stub:
        db_2d = np.zeros((4, 17, 2), np.float32)
        db_3d = np.zeros((4, 17, 3), np.float32)

        def __len__(self):
            return 4

    stub_concat = ConcatDataset([Stub(), Stub()])
    with pytest.raises(ValueError, match="augment_batch_cond"):
        stub_concat.augment_batch_cond(x, c, np.random.RandomState(0))
    with pytest.raises(ValueError, match="augment_batch"):
        stub_concat.augment_batch(x, np.random.RandomState(0))


def test_train_loop_cond_uses_joint_aug(tmp_path, rng):
    """train_loop with condition_data + flip/rot augs routes through
    augment_batch_cond (joint transform), NOT augment_batch — and the
    transformed condition is what reaches the step."""
    import configs.optim.concat_pose_optimization_mini as mini_cfg
    from zedo_tpu.data.base import PoseDataset
    from zedo_tpu.models import score_mlp
    from zedo_tpu.train import trainer

    class DS(PoseDataset):
        def read_data(self):
            self.db_2d = np.zeros((32, 17, 2), np.float32)
            self.db_3d = rng.randn(32, 17, 3).astype(np.float32) * 0.1
            self.camera_param = None

    config = mini_cfg.get_config()
    config.training.batch_size = 16
    config.model.num_scales = 20
    model_cfg = score_mlp.ScoreMLPConfig(
        n_joints=17, joint_dim=3, hidden_dim=32, embed_dim=16, n_blocks=1,
        group_norm_groups=8, embedding_type="positional", num_scales=20)

    ds = DS(subset="train", flip=True, rot=True)
    cond = rng.randn(32, 17, 2).astype(np.float32)
    plain_calls, joint_calls = [], []
    orig_joint = ds.augment_batch_cond
    ds.augment_batch = lambda b, r: plain_calls.append(len(b)) or b
    ds.augment_batch_cond = (
        lambda b, c, r: joint_calls.append(len(b)) or orig_joint(b, c, r))
    trainer.train_loop(
        config, ds, output_dir=str(tmp_path / "cond_aug"),
        model_cfg=model_cfg, condition_data=cond,
        trainer_cfg=trainer.TrainerConfig(n_epochs=1, eval_freq=100, seed=0))
    assert joint_calls == [16, 16]   # every batch through the joint path
    assert plain_calls == []         # 3D-only aug never touches cond training

    # a dataset that wants augs but has no joint-aug path is refused loudly
    # (duck-typed datasets: augment_batch alone would desync the condition)
    stub = types.SimpleNamespace(
        db_3d=ds.db_3d, flip=True, rot=False,
        augment_batch=lambda b, r: b)
    with pytest.raises(ValueError, match="augment_batch_cond"):
        trainer.train_loop(
            config, stub, output_dir=str(tmp_path / "bad"),
            model_cfg=model_cfg, condition_data=cond,
            trainer_cfg=trainer.TrainerConfig(n_epochs=1, eval_freq=100))


def test_valid_ind_bool_rows_are_masks(rng):
    """A boolean list-of-lists valid_ind is interpreted as per-sample MASKS:
    True/False used to fall through to the index branch and cast to indices
    1/0, silently validating the wrong hypotheses (advisor r4)."""
    n, s = 5, 3
    gt = rng.randn(n, 17, 3).astype(np.float32)
    preds = np.stack([gt + 0.01 * (h + 1) for h in range(s)], axis=1)
    # mask rows excluding hypothesis 0 (the best) — as plain Python lists
    rows = [[False, True, True]] * n
    filt = evaluation.multi_hypothesis_eval(preds, gt, valid_ind=rows)
    assert np.all(filt.min_hypothesis == 1)
    want = evaluation.multi_hypothesis_eval(preds, gt, valid_ind=[[1, 2]] * n)
    assert filt.error == want.error
    # mixed bool/index rows are rejected, as are wrong-length masks
    with pytest.raises(ValueError, match="mask"):
        evaluation.multi_hypothesis_eval(
            preds, gt, valid_ind=[[True, True, True]] * (n - 1) + [[1, 2]])
    with pytest.raises(ValueError, match="mask"):
        evaluation.multi_hypothesis_eval(
            preds, gt, valid_ind=[[True, True]] * n)
    # non-integer index rows are rejected instead of truncated
    with pytest.raises(ValueError, match="integer"):
        evaluation.multi_hypothesis_eval(preds, gt, valid_ind=[[1.5]] * n)
