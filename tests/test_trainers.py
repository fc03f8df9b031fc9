"""Trainer smoke tests: recognizer fit loop on a tiny synthetic char-folder
tree; localizer train step + eval; checkpoint round-trip; hns artifacts."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image, ImageDraw, ImageFont

from effocr_tpu.core.config import (
    EncoderConfig,
    LocalizerConfig,
    LocalizerTrainConfig,
    RecognizerTrainConfig,
)
from effocr_tpu.data.folder import CharFolderDataset, split_indices
from effocr_tpu.models import create_encoder, create_localizer
from effocr_tpu.train.localizer import LocalizerTrainer
from effocr_tpu.train.recognizer import RecognizerTrainer

FONT = "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"
CHARS = list("AXo")


@pytest.fixture(scope="module")
def char_tree(tmp_path_factory):
    """<root>/<ord>/: one 'render' (0x..._idx_font.png) and two PAIRED
    crops per char, tagged to line stems line0/line1."""
    root = tmp_path_factory.mktemp("chars")
    font = ImageFont.truetype(FONT, 40)
    for c in CHARS:
        d = root / str(ord(c))
        d.mkdir()
        img = Image.new("RGB", (64, 64), (255, 255, 255))
        ImageDraw.Draw(img).text((12, 8), c, (0, 0, 0), font=font)
        img.save(d / f"{hex(ord(c))}_0_TestFont-Regular.png")
        for li in range(2):
            img2 = Image.new("RGB", (60, 62), (255, 255, 255))
            ImageDraw.Draw(img2).text((10, 8), c, (20, 20, 20), font=font)
            img2.save(
                d / f"PAIRED_line{li}_{li}_{hex(ord(c))}_{li}.png"
            )
    return str(root)


def test_char_folder_dataset(char_tree):
    ds = CharFolderDataset(char_tree)
    assert len(ds) == 9
    assert len(ds.classes) == 3
    assert sum(ds.is_paired(i) for i in range(len(ds))) == 6
    imgs, targets, paired = ds.load_batch(list(range(3)), size=64)
    assert imgs.shape == (3, 64, 64, 3)
    # render char decoding from filenames
    ridx = ds.render_indices("TestFont")[0]
    assert ds.char_for_path(ds.data[ridx][0]) in CHARS


def test_split_indices_leakage(char_tree):
    ds = CharFolderDataset(char_tree)
    idx_train, idx_val, idx_test = split_indices(
        ds, ["line0"], ["line1"], ["line1"]
    )
    assert not set(idx_train) & set(idx_val)
    # train = renders + line0 paired
    assert len(idx_train) == 3 + 3
    assert len(idx_val) == 3


def test_recognizer_trainer_fit_and_artifacts(char_tree, tmp_path):
    ds = CharFolderDataset(char_tree)
    idx_train, idx_val, _ = split_indices(ds, ["line0"], ["line1"], ["line1"])
    cfg = RecognizerTrainConfig(
        encoder=EncoderConfig(arch="convnext_atto", image_size=64),
        batch_size=6, m_per_class=2, num_epochs=1, lr=1e-4, lang="en",
    )
    model = create_encoder("convnext_atto", dtype=jnp.float32)
    run_dir = str(tmp_path / "run")
    trainer = RecognizerTrainer(cfg, model, run_dir)
    trainer.init_state(jax.random.PRNGKey(0))
    acc = trainer.fit(ds, idx_train, idx_val, ds.render_indices())
    assert 0.0 <= acc <= 1.0
    assert os.path.exists(os.path.join(run_dir, "enc_best.msgpack"))

    index = trainer.build_ref_index(ds, ds.render_indices())
    assert os.path.exists(os.path.join(run_dir, "ref.npz"))
    assert os.path.exists(os.path.join(run_dir, "ref.txt"))
    assert sorted(index.chars) == sorted(CHARS)

    paired_idx = [i for i in idx_train if ds.is_paired(i)]
    lines = trainer.infer_hardneg(ds, paired_idx, index, k=3)
    assert len(lines) == len(paired_idx)
    assert all(len(l) == 3 for l in lines)
    assert os.path.exists(os.path.join(run_dir, "hns.txt"))

    # checkpoint round-trip
    trainer.load_best()


def test_recognizer_trainer_resume(char_tree, tmp_path):
    """fit(resume=True) restores last.msgpack + last_meta.json and
    continues from the recorded epoch: with num_epochs equal to the
    completed count it trains zero steps and the params are exactly the
    saved train state's."""
    import numpy as np

    ds = CharFolderDataset(char_tree)
    idx_train, idx_val, _ = split_indices(ds, ["line0"], ["line1"],
                                          ["line1"])
    cfg = RecognizerTrainConfig(
        encoder=EncoderConfig(arch="convnext_atto", image_size=64),
        batch_size=6, m_per_class=2, num_epochs=1, lr=1e-4, lang="en",
    )
    run_dir = str(tmp_path / "run_resume")
    model = create_encoder("convnext_atto", dtype=jnp.float32)
    trainer = RecognizerTrainer(cfg, model, run_dir)
    trainer.init_state(jax.random.PRNGKey(0))
    best1 = trainer.fit(ds, idx_train, idx_val, ds.render_indices())
    assert os.path.exists(os.path.join(run_dir, "last.msgpack"))
    assert os.path.exists(os.path.join(run_dir, "last_meta.json"))
    saved = jax.tree.map(np.asarray, trainer.state["params"])

    trainer2 = RecognizerTrainer(cfg, model, run_dir)
    trainer2.init_state(jax.random.PRNGKey(7))   # different init
    best2 = trainer2.fit(ds, idx_train, idx_val, ds.render_indices(),
                         resume=True)
    assert best2 == best1                        # best_acc restored
    for a, b in zip(jax.tree.leaves(saved),
                    jax.tree.leaves(trainer2.state["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_recognizer_recipe_aux_cosine_centroid(char_tree, tmp_path):
    """From-scratch recipe: aux cosine-classifier CE + warmup/cosine lr +
    centroid prototypes; artifacts stay encoder-only."""
    ds = CharFolderDataset(char_tree)
    idx_train, idx_val, _ = split_indices(ds, ["line0"], ["line1"], ["line1"])
    cfg = RecognizerTrainConfig(
        encoder=EncoderConfig(arch="convnext_atto", image_size=64),
        batch_size=6, m_per_class=2, num_epochs=2, lr=1e-3, lang="en",
        lr_schedule="cosine", warmup_frac=0.25, aux_ce_weight=1.0,
        aux_lr_mult=10.0, ref_source="centroid", centroid_cap=4,
    )
    model = create_encoder("convnext_atto", dtype=jnp.float32)
    run_dir = str(tmp_path / "run_aux")
    trainer = RecognizerTrainer(cfg, model, run_dir)
    trainer.init_state(jax.random.PRNGKey(0))
    acc = trainer.fit(ds, idx_train, idx_val, ds.render_indices())
    assert 0.0 <= acc <= 1.0
    # aux head exists in state but not in the saved checkpoint
    assert "aux" in trainer.state
    assert trainer.state["aux"]["w"].shape[0] == len(ds.class_to_idx)
    import msgpack  # noqa: F401  (format sanity via loader below)
    from effocr_tpu.train import checkpoint as ckpt
    loaded = ckpt.load_variables(
        trainer.variables, ckpt.best_checkpoint_path(run_dir)
    )
    assert "params" in loaded and "aux" not in loaded

    # centroid ref index: one row per class
    index = trainer.build_ref_index(ds, ds.render_indices(),
                                    centroid_idx=idx_train)
    assert len(index.chars) == len(ds.class_to_idx)
    assert sorted(index.chars) == sorted(CHARS)
    # rows are L2-normalized
    norms = np.linalg.norm(index.embeddings, axis=1)
    assert np.allclose(norms, 1.0, atol=1e-4)

    # centroid helper: classes and unit norms
    cents, targets = trainer.class_centroids(ds, idx_train)
    assert cents.shape[0] == len(targets) == 3
    assert np.allclose(np.linalg.norm(cents, axis=1), 1.0, atol=1e-4)


def test_localizer_trainer_step_and_eval(tmp_path):
    cfg = LocalizerTrainConfig(
        localizer=LocalizerConfig(arch="yolov5n", num_classes=2,
                                  input_size=128, max_det=32, max_nms=128),
        batch_size=2,
    )
    model = create_localizer("yolov5n", num_classes=2, dtype=jnp.float32)
    trainer = LocalizerTrainer(cfg, model, str(tmp_path / "loc"),
                               total_steps=10)
    trainer.init_state(jax.random.PRNGKey(0), 128)

    imgs = np.zeros((2, 128, 128, 3), np.float32)
    imgs[:, 40:80, 30:60] = 0.2
    tgts = np.zeros((2, 8, 5), np.float32)
    tgts[:, 0] = [0, 45, 60, 30, 40]
    masks = np.zeros((2, 8), bool)
    masks[:, 0] = True
    loss, parts = trainer.train_step(
        jnp.asarray(imgs), jnp.asarray(tgts), jnp.asarray(masks)
    )
    assert np.isfinite(loss)
    assert set(parts) == {"loss/box", "loss/obj", "loss/cls"}

    gts = [{"boxes": np.array([[30.0, 40, 60, 80]]), "classes": [0]}] * 2
    result = trainer.evaluate([(imgs, gts)])
    assert set(result) == {"bbox/AP", "bbox/AP50", "bbox/AP75"}
    assert os.path.exists(
        os.path.join(str(tmp_path / "loc"), "best_bbox_mAP.msgpack")
    )
    trainer.save("last")
    assert trainer.resume("last")


def test_detection_dataset_rect_canvas(tmp_path):
    """Rectangular training canvas: image letterboxed to (input_height,
    input_size); targets follow the same geometry."""
    import json
    from PIL import Image as PILImage
    from effocr_tpu.data.detection import DetectionDataset

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    arr = np.full((50, 800, 3), 255, np.uint8)
    arr[10:40, 100:140] = 0
    PILImage.fromarray(arr).save(img_dir / "l0.png")
    coco = {
        "images": [{"id": 0, "file_name": "l0.png", "width": 800,
                    "height": 50, "text": "x"}],
        "annotations": [{"id": 0, "image_id": 0, "category_id": 0,
                         "bbox": [100, 10, 40, 30], "area": 1200,
                         "iscrowd": 0}],
        "categories": [{"id": 0, "name": "char"}],
    }
    cj = tmp_path / "c.json"
    cj.write_text(json.dumps(coco))

    ds = DetectionDataset(str(cj), str(img_dir), input_size=512,
                          input_height=64)
    x, targets, mask, gt = ds.load(0)
    assert x.shape == (64, 512, 3)
    assert mask[0] and not mask[1]
    r = 512 / 800  # width-bound scale
    np.testing.assert_allclose(targets[0, 3], 40 * r, atol=1.0)
    np.testing.assert_allclose(targets[0, 4], 30 * r, atol=1.0)
    # box center inside the canvas
    assert 0 <= targets[0, 1] <= 512 and 0 <= targets[0, 2] <= 64
    imgs, t, m, gts = next(iter(ds.batches(1, shuffle=False,
                                           drop_last=False)))
    assert imgs.shape == (1, 64, 512, 3)


def test_fit_anchors(rng):
    from effocr_tpu.train.localizer import fit_anchors

    # two clear clusters of box sizes
    small = rng.normal(loc=(16, 24), scale=1.0, size=(200, 2))
    large = rng.normal(loc=(80, 40), scale=2.0, size=(200, 2))
    anchors = fit_anchors(np.concatenate([small, large]), n=6)
    assert anchors.shape == (6, 2)
    areas = anchors[:, 0] * anchors[:, 1]
    assert (np.diff(areas) >= 0).all()  # sorted by area
    # cluster centers recovered approximately
    assert np.abs(anchors[0] - [16, 24]).max() < 6
    assert np.abs(anchors[-1] - [80, 40]).max() < 8


def test_recognizer_resident_bank(char_tree, tmp_path):
    """data_device="resident": the dataset is uploaded to HBM once as a
    gray uint8 bank and steps ship indices only; embeddings from the bank
    path match the streamed path on the same weights."""
    ds = CharFolderDataset(char_tree)
    idx_train, idx_val, _ = split_indices(ds, ["line0"], ["line1"], ["line1"])
    cfg = RecognizerTrainConfig(
        encoder=EncoderConfig(arch="convnext_atto", image_size=64),
        batch_size=6, m_per_class=2, num_epochs=1, lr=1e-4, lang="en",
        data_device="resident", aux_ce_weight=1.0, ref_source="centroid",
        centroid_cap=4,
    )
    model = create_encoder("convnext_atto", dtype=jnp.float32)
    trainer = RecognizerTrainer(cfg, model, str(tmp_path / "run_bank"))
    trainer.init_state(jax.random.PRNGKey(0))
    acc = trainer.fit(ds, idx_train, idx_val, ds.render_indices())
    assert 0.0 <= acc <= 1.0
    assert trainer.bank is not None

    # bank-path embeddings == streamed-path embeddings (same weights);
    # the bank stores gray uint8 of the same decoded crops, and the
    # streamed path sees achromatic crops, so embeddings must agree
    probe = idx_train[:4]
    e_bank, l_bank = trainer.embed_indices(ds, probe)
    bank, trainer.bank = trainer.bank, None
    e_stream, l_stream = trainer.embed_indices(ds, probe)
    trainer.bank = bank
    np.testing.assert_array_equal(l_bank, l_stream)
    np.testing.assert_allclose(e_bank, e_stream, rtol=2e-2, atol=2e-2)


def test_localizer_resident_bank(tmp_path):
    """Detector resident bank: materialized canvases/targets gathered by
    index produce the same loss trajectory as streamed batches."""
    import json

    from PIL import Image

    from effocr_tpu.data.detection import DetectionDataset
    from effocr_tpu.train.localizer import LocalizerTrainer
    from effocr_tpu.core.config import LocalizerConfig, LocalizerTrainConfig
    from effocr_tpu.models import create_localizer

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    coco = {"images": [], "annotations": [], "categories": [
        {"id": 0, "name": "char"}, {"id": 1, "name": "word"}]}
    rng = np.random.default_rng(0)
    for i in range(4):
        arr = np.full((40, 200, 3), 255, np.uint8)
        arr[10:30, 20 + 10 * i : 40 + 10 * i] = 0
        Image.fromarray(arr).save(img_dir / f"l{i}.png")
        coco["images"].append({"id": i, "file_name": f"l{i}.png",
                               "width": 200, "height": 40, "text": "x"})
        coco["annotations"].append(
            {"id": i, "image_id": i, "category_id": 0,
             "bbox": [20 + 10 * i, 10, 20, 20], "area": 400, "iscrowd": 0})
    cj = tmp_path / "c.json"
    cj.write_text(json.dumps(coco))

    ds = DetectionDataset(str(cj), str(img_dir), input_size=256,
                          input_height=64, max_targets=8)
    imgs_bank, tgts_bank, masks_bank = ds.materialize()
    assert imgs_bank.shape == (4, 64, 256, 3) and imgs_bank.dtype == np.uint8

    cfg = LocalizerTrainConfig(
        localizer=LocalizerConfig(arch="yolov5n", input_size=256,
                                  input_height=64, num_classes=2),
        batch_size=2, lr=1e-3, num_epochs=1,
    )
    model = create_localizer("yolov5n", num_classes=2, dtype=jnp.float32)
    tr_a = LocalizerTrainer(cfg, model, str(tmp_path / "a"), total_steps=2)
    tr_a.init_state(jax.random.PRNGKey(0), 256)
    tr_b = LocalizerTrainer(cfg, model, str(tmp_path / "b"), total_steps=2)
    tr_b.init_state(jax.random.PRNGKey(0), 256)

    imgs, tgts, masks, _ = next(iter(ds.batches(2, shuffle=False)))
    loss_stream, _ = tr_a.train_step(
        jnp.asarray(imgs), jnp.asarray(tgts), jnp.asarray(masks)
    )
    loss_bank, _ = tr_b.train_step_bank(ds, [0, 1])
    assert abs(loss_stream - loss_bank) < 1e-4, (loss_stream, loss_bank)

def test_build_index_cli(char_tree, tmp_path, monkeypatch):
    """`build-index` rebuilds ref.npz/ref.txt from a run dir's enc_best +
    args_log.json without re-running fit (mid-flight harvest path)."""
    import json
    import sys

    from effocr_tpu.cli import build_index as bi

    ds = CharFolderDataset(char_tree)
    idx_train, idx_val, _ = split_indices(ds, ["line0"], ["line1"], ["line1"])
    cfg = RecognizerTrainConfig(
        encoder=EncoderConfig(arch="convnext_atto", image_size=64),
        batch_size=6, m_per_class=2, num_epochs=1, lr=1e-3, lang="en",
        ref_source="centroid", centroid_cap=4,
    )
    model = create_encoder("convnext_atto", dtype=jnp.float32)
    run_dir = tmp_path / "run_bi"
    trainer = RecognizerTrainer(cfg, model, str(run_dir))
    trainer.init_state(jax.random.PRNGKey(0))
    trainer.fit(ds, idx_train, idx_val, ds.render_indices())

    # the ann jsons + args_log.json the CLI trainer would have written
    def ann(stem):
        p = tmp_path / f"{stem}.json"
        p.write_text(json.dumps(
            {"images": [{"id": 0, "file_name": f"{stem.split('_')[-1]}.png"}],
             "annotations": [], "categories": []}))
        return str(p)

    (run_dir / "args_log.json").write_text(json.dumps({
        "root_dir_path": char_tree, "auto_model": "convnext_atto",
        "imsize": 64, "batch_size": 6, "temp": 0.1, "m": 2, "lang": "en",
        "ref_source": "centroid", "centroid_cap": 4, "N_classes": None,
        "train_ann_path": ann("t_line0"), "val_ann_path": ann("v_line1"),
        "test_ann_path": ann("s_line1"), "render_font_name": "TestFont",
    }))
    for f in ("ref.npz", "ref.txt"):
        (run_dir / f).unlink(missing_ok=True)

    monkeypatch.setattr(sys, "argv",
                        ["build-index", "--run_dir", str(run_dir), "--test"])
    bi.main()
    assert (run_dir / "ref.npz").exists() and (run_dir / "ref.txt").exists()
    from effocr_tpu.retrieval.index import PrototypeIndex
    idx = PrototypeIndex.load(str(run_dir))
    assert sorted(idx.chars) == sorted(CHARS)

def test_checkpoint_atomic_write(tmp_path):
    """save_variables goes through temp-file + os.replace: no .tmp left
    behind, and an in-place rewrite fully replaces the old bytes (a
    concurrent build-index harvest must never see a torn checkpoint)."""
    import numpy as np

    from effocr_tpu.train import checkpoint as ckpt

    path = str(tmp_path / "enc_best.msgpack")
    v1 = {"params": {"w": np.zeros((4, 4), np.float32)}}
    v2 = {"params": {"w": np.ones((4, 4), np.float32)}}
    ckpt.save_variables(v1, path)
    ckpt.save_variables(v2, path)
    assert not (tmp_path / "enc_best.msgpack.tmp").exists()
    out = ckpt.load_variables(v1, path)
    np.testing.assert_array_equal(out["params"]["w"], v2["params"]["w"])

def test_recognizer_dp_mesh_matches_single_device(char_tree, tmp_path):
    """Data-parallel fit on a 2-device CPU mesh computes the same training
    trajectory as single-device: identical final params (the DataParallel
    correctness axis — reference train_effocr_recognizer.py:288-293 — as
    math, not just a compile check)."""
    from effocr_tpu.core.mesh import make_mesh

    ds = CharFolderDataset(char_tree)
    idx_train, idx_val, _ = split_indices(ds, ["line0"], ["line1"],
                                          ["line1"])
    cfg = RecognizerTrainConfig(
        encoder=EncoderConfig(arch="convnext_atto", image_size=64),
        batch_size=6, m_per_class=2, num_epochs=1, lr=1e-3, lang="en",
        no_aug=True,
    )

    def run(mesh):
        model = create_encoder("convnext_atto", dtype=jnp.float32)
        tr = RecognizerTrainer(cfg, model, str(tmp_path / f"dp{bool(mesh)}"),
                               mesh=mesh)
        tr.init_state(jax.random.PRNGKey(0))
        tr.fit(ds, idx_train, idx_val, ds.render_indices())
        return jax.tree_util.tree_leaves(
            jax.device_get(tr.state["params"])
        )

    single = run(None)
    dp = run(make_mesh(jax.devices("cpu")[:2], model=1))
    assert len(single) == len(dp)
    for a, b in zip(single, dp):
        np.testing.assert_allclose(a, b, atol=2e-4), (a.shape)

def test_localizer_dp_mesh_matches_single_device(tmp_path):
    """Localizer train_step on a 2-device CPU mesh computes the same loss
    and gradient update as single-device (detectron2 launch/DDP parity —
    reference train_effocr_localizer_d2.py:258-265 — as math)."""
    from effocr_tpu.core.mesh import make_mesh

    cfg = LocalizerTrainConfig(
        localizer=LocalizerConfig(arch="yolov5n", num_classes=2,
                                  input_size=128, max_det=32, max_nms=128),
        batch_size=2,
    )
    imgs = np.zeros((2, 128, 128, 3), np.float32)
    imgs[0, 40:80, 30:60] = 0.2
    imgs[1, 20:60, 50:90] = 0.4
    tgts = np.zeros((2, 8, 5), np.float32)
    tgts[0, 0] = [0, 45, 60, 30, 40]
    tgts[1, 0] = [1, 70, 40, 40, 40]
    masks = np.zeros((2, 8), bool)
    masks[:, 0] = True

    def run(mesh):
        model = create_localizer("yolov5n", num_classes=2,
                                 dtype=jnp.float32)
        tr = LocalizerTrainer(cfg, model,
                              str(tmp_path / f"loc{bool(mesh)}"),
                              total_steps=10, mesh=mesh)
        tr.init_state(jax.random.PRNGKey(0), 128)
        losses = [
            float(tr.train_step(jnp.asarray(imgs), jnp.asarray(tgts),
                                jnp.asarray(masks))[0])
            for _ in range(3)
        ]
        return losses, jax.tree_util.tree_leaves(
            jax.device_get(tr.state["params"])
        )

    losses_s, params_s = run(None)
    losses_d, params_d = run(make_mesh(jax.devices("cpu")[:2], model=1))
    np.testing.assert_allclose(losses_s, losses_d, atol=1e-4)
    for a, b in zip(params_s, params_d):
        np.testing.assert_allclose(a, b, atol=2e-4)
