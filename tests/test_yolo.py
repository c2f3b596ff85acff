"""YOLOv8 family tests — architecture, DFL decode, ultralytics-layout weight
conversion (parity vs a torch mirror), and the detector facade.

The reference's shipping detector is a fine-tuned ultralytics YOLOv8 behind
the DETR-shaped interface (reference src/detection/yolov8_detector.py);
models/yolo.py is its TPU-native counterpart.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from office_person_detection_vit_tpu.config.config_manager import ConfigManager
from office_person_detection_vit_tpu.models.yolo import (
    VARIANTS,
    YOLOConfig,
    YOLOv8,
    decode_yolo,
    dfl_expectation,
    init_yolo,
)

torch = pytest.importorskip("torch")

from helpers.torch_yolov8 import (  # noqa: E402
    DetectionModel,
    randomize_bn_stats,
)


def _tiny_torch(seed: int = 0, nc: int = 1) -> "DetectionModel":
    tm = DetectionModel(VARIANTS["tiny"], nc=nc)
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in tm.named_parameters():
            if "dfl" not in name:
                p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    randomize_bn_stats(tm, seed + 1)
    tm.eval()
    return tm


class TestArchitecture:
    def test_variant_channel_math_matches_ultralytics_param_counts(self):
        # Published ultralytics totals are rounded and include BN running
        # stats (folded away here) — match within 1.5%.
        published = {"n": 3.2e6, "s": 11.2e6, "m": 25.9e6, "l": 43.7e6, "x": 68.2e6}
        for v, total in published.items():
            cfg = YOLOConfig(variant=v, num_classes=80, dtype="float32")
            shapes = jax.eval_shape(
                lambda cfg=cfg: YOLOv8(cfg).init(
                    jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3)),
                    deterministic=True,
                )
            )
            n = sum(x.size for x in jax.tree_util.tree_leaves(shapes))
            assert abs(n - total) / total < 0.015, (v, n)

    def test_forward_shapes_tiny(self):
        cfg = YOLOConfig.tiny()
        model, variables = init_yolo(cfg, jax.random.PRNGKey(0), input_hw=(64, 96))
        out = model.apply(variables, jnp.zeros((2, 64, 96, 3)), deterministic=True)
        assert len(out["levels"]) == 3
        for lv, stride in zip(out["levels"], cfg.strides):
            assert lv["box_dist"].shape == (2, 64 // stride, 96 // stride,
                                            4 * cfg.reg_max)
            assert lv["class_logits"].shape == (2, 64 // stride, 96 // stride, 1)

    def test_dfl_expectation_matches_torch_dfl_module(self):
        from helpers.torch_yolov8 import DFL

        rng = np.random.default_rng(3)
        logits = rng.normal(size=(2, 5, 7, 64)).astype(np.float32)
        ours = np.asarray(dfl_expectation(jnp.asarray(logits), 16))  # (2,5,7,4)
        # torch DFL consumes (b, 4*reg_max, anchors) with the 4 box sides
        # as the OUTER groups of the channel axis — same layout as ours.
        t_in = torch.from_numpy(logits.reshape(2, 35, 64).transpose(0, 2, 1))
        theirs = DFL(16)(t_in).detach().numpy()  # (2, 4, 35)
        np.testing.assert_allclose(
            ours.reshape(2, 35, 4), theirs.transpose(0, 2, 1), atol=1e-5
        )

    def test_decode_contract(self):
        cfg = YOLOConfig.tiny()
        model, variables = init_yolo(cfg, jax.random.PRNGKey(1), input_hw=(64, 96))
        frames = jnp.asarray(
            np.random.default_rng(0).normal(size=(2, 64, 96, 3)), jnp.float32
        )
        out = model.apply(variables, frames, deterministic=True)
        batch = decode_yolo(out, jnp.asarray([96.0, 64.0]), (64, 96), cfg, 0.0)
        b = np.asarray(batch.boxes_xywh)
        f = np.asarray(batch.foot)
        v = np.asarray(batch.valid)
        assert b.shape == (2, cfg.max_detections, 4)
        np.testing.assert_allclose(f[..., 0], b[..., 0] + b[..., 2] / 2, atol=1e-3)
        np.testing.assert_allclose(f[..., 1], b[..., 1] + b[..., 3], atol=1e-3)
        assert (b[v][:, 0] >= -1e-3).all() and (b[v][:, 1] >= -1e-3).all()
        assert (b[v][:, 0] + b[v][:, 2] <= 96 + 1e-3).all()
        assert (b[v][:, 1] + b[v][:, 3] <= 64 + 1e-3).all()


class TestWeightConversion:
    @pytest.fixture(scope="class")
    def pair(self):
        from office_person_detection_vit_tpu.models.weights import (
            convert_yolov8_state_dict,
        )

        tm = _tiny_torch()
        variables = convert_yolov8_state_dict(tm.state_dict())
        cfg = YOLOConfig.tiny()
        model = YOLOv8(cfg)
        return tm, model, variables, cfg

    def test_converted_tree_matches_init_tree(self, pair):
        _, model, variables, cfg = pair
        ref = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3)),
                               deterministic=True)
        )
        got = {
            "/".join(str(k.key) for k in path): leaf.shape
            for path, leaf in jax.tree_util.tree_leaves_with_path(variables)
        }
        want = {
            "/".join(str(k.key) for k in path): leaf.shape
            for path, leaf in jax.tree_util.tree_leaves_with_path(ref)
        }
        assert got == want

    def test_full_model_parity_vs_torch(self, pair):
        tm, model, variables, cfg = pair
        rng = np.random.default_rng(7)
        x = rng.normal(size=(2, 64, 96, 3)).astype(np.float32) * 0.5
        with torch.no_grad():
            t_levels = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        out = model.apply(variables, jnp.asarray(x), deterministic=True)
        for (t_box, t_cls), lv in zip(t_levels, out["levels"]):
            np.testing.assert_allclose(
                np.asarray(lv["box_dist"]),
                t_box.numpy().transpose(0, 2, 3, 1),
                atol=2e-4,
            )
            np.testing.assert_allclose(
                np.asarray(lv["class_logits"]),
                t_cls.numpy().transpose(0, 2, 3, 1),
                atol=2e-4,
            )

    def test_accepts_model_model_prefix(self, pair):
        from office_person_detection_vit_tpu.models.weights import (
            convert_yolov8_state_dict,
        )

        tm, _, variables, _ = pair
        wrapped = {f"model.{k}": v for k, v in tm.state_dict().items()}
        again = convert_yolov8_state_dict(wrapped)
        flat_a = jax.tree_util.tree_leaves(variables)
        flat_b = jax.tree_util.tree_leaves(again)
        assert len(flat_a) == len(flat_b)
        for a, b in zip(flat_a, flat_b):
            np.testing.assert_array_equal(a, b)


class TestYOLOCriterion:
    def test_ciou_identity_and_disjoint(self):
        from office_person_detection_vit_tpu.training.yolo_criterion import ciou

        a = jnp.asarray([10.0, 10.0, 50.0, 90.0])
        assert float(ciou(a, a)) == pytest.approx(1.0, abs=1e-6)
        b = jnp.asarray([200.0, 200.0, 240.0, 280.0])
        assert float(ciou(a, b)) < 0.0  # disjoint: IoU 0 minus distance terms

    def test_dfl_loss_minimal_at_target_bins(self):
        from office_person_detection_vit_tpu.training.yolo_criterion import dfl_loss

        R = 16
        target = jnp.asarray([[3.0, 7.25, 0.0, 14.99]])
        # Logits sharply peaked at the bracketing bins with the right weights.
        logits = np.full((1, 4, R), -20.0, np.float32)
        for s in range(4):
            t = float(target[0, s])
            tl = int(np.floor(t))
            logits[0, s, tl] = 20.0 + np.log(max(tl + 1 - t, 1e-9))
            if t > tl:
                logits[0, s, tl + 1] = 20.0 + np.log(t - tl)
        sharp = dfl_loss(jnp.asarray(logits), target)
        flat = dfl_loss(jnp.zeros((1, 4, R)), target)
        assert (np.asarray(sharp) < np.asarray(flat)).all()
        # Integer target with a one-hot distribution -> loss ~ 0.
        assert float(sharp[0, 0]) == pytest.approx(0.0, abs=1e-3)

    def test_train_step_decreases_loss(self):
        import optax

        from office_person_detection_vit_tpu.training import (
            TrainState,
            make_yolo_train_step,
            pack_targets,
        )

        cfg = YOLOConfig.tiny()
        model, variables = init_yolo(cfg, jax.random.PRNGKey(0), (64, 64))
        tx = optax.adam(1e-3)
        state = TrainState.create(variables["params"], tx)
        step = make_yolo_train_step(model, tx, (64, 64))
        rng = np.random.default_rng(0)
        per_image_boxes = [rng.uniform(0.3, 0.6, (2, 4)) for _ in range(2)]
        labels, boxes, valid = pack_targets(
            per_image_boxes, [[1, 1], [1, 1]], capacity=3
        )
        batch = {
            "pixels": jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32),
            "labels": labels,
            "boxes": boxes,
            "valid": valid,
        }
        losses = []
        for i in range(5):
            state, metrics = step(state, batch, jax.random.PRNGKey(i))
            losses.append(float(metrics["loss"]))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]
        assert float(metrics["num_pos"]) >= 1


class TestYOLOShardedTraining:
    def test_sharded_step_matches_single_device(self):
        """DP over the 8-device mesh computes the same loss/updates as one
        device (GSPMD grad all-reduce; conv params replicate — no TP rule
        matches them)."""
        import optax

        from office_person_detection_vit_tpu.parallel.mesh import make_mesh
        from office_person_detection_vit_tpu.training import (
            TrainState,
            make_yolo_sharded_train_step,
            make_yolo_train_step,
            pack_targets,
        )

        cfg = YOLOConfig.tiny()
        model, variables = init_yolo(cfg, jax.random.PRNGKey(0), (64, 64))
        params = variables["params"]
        tx = optax.adam(1e-3)
        rng = np.random.default_rng(0)
        labels, boxes, valid = pack_targets(
            [rng.uniform(0.3, 0.6, (2, 4)) for _ in range(8)],
            [[1, 1]] * 8, capacity=3,
        )
        batch = {
            "pixels": jnp.asarray(rng.normal(size=(8, 64, 64, 3)), jnp.float32),
            "labels": labels, "boxes": boxes, "valid": valid,
        }
        key = jax.random.PRNGKey(2)

        single = make_yolo_train_step(model, tx, (64, 64))
        s1, m1 = single(TrainState.create(params, tx), batch, key)

        mesh = make_mesh(8)
        sharded = make_yolo_sharded_train_step(model, tx, mesh, params, (64, 64))
        st = sharded.shard_state(TrainState.create(params, tx))
        s2, m2 = sharded(st, sharded.shard_batch(batch), key)

        assert float(m2["loss"]) == pytest.approx(float(m1["loss"]), rel=1e-5)
        l1 = jax.tree_util.tree_leaves(jax.device_get(s1.params))
        l2 = jax.tree_util.tree_leaves(jax.device_get(s2.params))
        for a, b in zip(l1, l2):
            np.testing.assert_allclose(a, b, atol=1e-5)

    def test_train_tool_runs_yolo_family(self, tmp_path):
        """tools/train_detr.py --model yolo (the reference's
        tools/train_yolov8.py analog) trains the tiny variant end-to-end."""
        import json

        import cv2

        from tools.train_detr import main as train_main

        img_dir = tmp_path / "images"
        img_dir.mkdir()
        images, anns = [], []
        for i in range(8):
            img = np.full((96, 128, 3), 100, np.uint8)
            x, y, w, h = 20 + 6 * i, 20, 30, 50
            cv2.rectangle(img, (x, y), (x + w, y + h), (40, 60, 200), -1)
            cv2.imwrite(str(img_dir / f"i{i}.jpg"), img)
            images.append({"id": i, "file_name": f"i{i}.jpg",
                           "width": 128, "height": 96})
            anns.append({"id": i + 1, "image_id": i, "category_id": 1,
                         "bbox": [x, y, w, h], "area": w * h, "iscrowd": 0})
        (tmp_path / "coco.json").write_text(json.dumps(
            {"images": images, "annotations": anns,
             "categories": [{"id": 1, "name": "person"}]}))
        ckpt = tmp_path / "ckpt"
        rc = train_main([
            "--images", str(img_dir),
            "--annotations", str(tmp_path / "coco.json"),
            "--batch", "8", "--height", "96", "--width", "128",
            "--model", "yolo", "--tiny",
            "--checkpoint", str(ckpt), "--lr", "1e-4", "--epochs", "2",
        ])
        assert rc == 0
        assert (ckpt / "weights.npz").exists()
        h = json.loads((ckpt / "history.json").read_text())
        assert len(h["step_losses"]) == 2
        assert all(np.isfinite(h["step_losses"]))


class TestYOLODetectorFacade:
    @pytest.fixture(scope="class")
    def tiny_yolo(self):
        from office_person_detection_vit_tpu.detection.yolo_detector import (
            YOLODetector,
        )

        cfg = ConfigManager.from_dict(
            {
                "detection": {
                    "confidence_threshold": 0.0,
                    "batch_size": 2,
                    "input_height": 96,
                    "input_width": 128,
                }
            }
        )
        det = YOLODetector(cfg, yolo_config=YOLOConfig.tiny())
        det.load_model()
        return det

    def test_batch_shapes_match_detr_contract(self, tiny_yolo):
        frames = np.random.default_rng(5).integers(0, 255, (3, 72, 96, 3), np.uint8)
        batch = tiny_yolo.detect_batch(frames)
        assert batch.boxes_xywh.shape == (3, 10, 4)
        assert batch.scores.shape == (3, 10)
        b = np.asarray(batch.boxes_xywh)
        f = np.asarray(batch.foot)
        np.testing.assert_allclose(f[:, :, 0], b[:, :, 0] + b[:, :, 2] / 2, atol=1e-3)
        np.testing.assert_allclose(f[:, :, 1], b[:, :, 1] + b[:, :, 3], atol=1e-3)

    def test_same_api_surface(self, tiny_yolo):
        frame = np.random.default_rng(6).integers(0, 255, (72, 96, 3), np.uint8)
        dets = tiny_yolo.detect(frame)
        assert isinstance(dets, list)
        dets2, feats = tiny_yolo.detect_with_features(frame)
        assert len(dets2) == len(feats)
        assert tiny_yolo.get_attention_map(frame) is None  # conv stub

    def test_factory_routes_yolo(self):
        from office_person_detection_vit_tpu.detection.ssd_detector import (
            SSDDetector,
            build_detector,
        )
        from office_person_detection_vit_tpu.detection.yolo_detector import (
            YOLODetector,
        )

        cfg = ConfigManager.from_dict({"detection": {"model": "yolo"}})
        assert isinstance(build_detector(cfg), YOLODetector)
        cfg = ConfigManager.from_dict({"detection": {"model": "ssd"}})
        det = build_detector(cfg)
        assert isinstance(det, SSDDetector) and not isinstance(det, YOLODetector)

    def test_loads_torch_state_dict_checkpoint(self, tmp_path):
        from office_person_detection_vit_tpu.detection.yolo_detector import (
            YOLODetector,
        )
        from office_person_detection_vit_tpu.models.weights import (
            convert_yolov8_state_dict,
        )

        tm = _tiny_torch(seed=11)
        ckpt = tmp_path / "best.pt"
        torch.save(tm.state_dict(), ckpt)
        cfg = ConfigManager.from_dict(
            {
                "detection": {
                    "confidence_threshold": 0.0,
                    "batch_size": 1,
                    "input_height": 64,
                    "input_width": 96,
                    "checkpoint_path": str(ckpt),
                }
            }
        )
        det = YOLODetector(cfg, yolo_config=YOLOConfig.tiny())
        det.load_model()
        want = convert_yolov8_state_dict(tm.state_dict())
        for a, b in zip(
            jax.tree_util.tree_leaves(jax.device_get(det.variables)),
            jax.tree_util.tree_leaves(want),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        frames = np.random.default_rng(1).integers(0, 255, (1, 64, 96, 3), np.uint8)
        batch = det.detect_batch(frames)
        assert batch.scores.shape == (1, 10)


def test_stablehlo_export_yolo_family(tmp_path):
    """The YOLO family exports/reloads through detection/export.py with
    the same flat-output contract as DETR/SSD (dynamic batch default)."""
    from office_person_detection_vit_tpu.config.config_manager import ConfigManager
    from office_person_detection_vit_tpu.detection.export import (
        export_detect,
        load_exported,
        run_exported,
        save_exported,
    )
    from office_person_detection_vit_tpu.detection.yolo_detector import YOLODetector
    from office_person_detection_vit_tpu.models.yolo import YOLOConfig

    cfg = ConfigManager.from_dict(
        {"detection": {"confidence_threshold": 0.0, "batch_size": 2,
                       "input_height": 96, "input_width": 128}}
    )
    det = YOLODetector(cfg, yolo_config=YOLOConfig.tiny())
    det.load_model()
    path = tmp_path / "yolo.stablehlo"
    save_exported(export_detect(det, source_hw=(96, 128), platforms=None),
                  path)
    frames = np.random.default_rng(2).integers(0, 255, (3, 96, 128, 3),
                                               np.uint8)
    out = run_exported(load_exported(path), det.variables, frames,
                       orig_wh=(128.0, 96.0), conf=0.0)
    ref = det.detect_batch(frames)
    np.testing.assert_allclose(out["boxes_xywh"], np.asarray(ref.boxes_xywh),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(out["valid"], np.asarray(ref.valid))


def test_yolo_detector_loads_trainer_npz(tmp_path):
    """detection.checkpoint_path accepts the trainer's flat-leaf
    weights.npz for the YOLO/SSD families (previously orbax-dir only —
    the trained-on-TPU -> pipeline closed loop needs this)."""
    import jax

    from office_person_detection_vit_tpu.config.config_manager import ConfigManager
    from office_person_detection_vit_tpu.detection.yolo_detector import YOLODetector
    from office_person_detection_vit_tpu.models.yolo import YOLOConfig, init_yolo

    cfg0 = YOLOConfig.tiny()
    _, variables = init_yolo(cfg0, jax.random.PRNGKey(3), input_hw=(64, 64))
    marked = jax.tree_util.tree_map(lambda x: x + 0 * x, variables)
    leaves = jax.tree_util.tree_leaves(jax.device_get(marked))
    np.savez(tmp_path / "weights.npz",
             **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)})

    cfg = ConfigManager.from_dict(
        {"detection": {"confidence_threshold": 0.5, "batch_size": 2,
                       "model_size": "tiny",
                       "checkpoint_path": str(tmp_path / "weights.npz"),
                       "input_height": 96, "input_width": 128}}
    )
    det = YOLODetector(cfg)
    det.load_model()
    got = jax.tree_util.tree_leaves(jax.device_get(det.variables))
    for a, b in zip(got, leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
