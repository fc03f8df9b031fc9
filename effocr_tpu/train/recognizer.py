"""Recognizer training: SupCon metric learning (kNN mode) or cross-entropy
(FFNN classifier mode).

Parity with train_effocr_recognizer.py: AdamW(lr 2e-6, wd 5e-4) (:326),
SupConLoss(temp .1) (:327), m-per-class batches without replacement,
per-epoch val precision@1 against the render prototype set (:81-102),
best-checkpoint keeping (:364-366), final prototype-index build (:47-62)
and k-NN hard-negative mining to hns.txt (:25-44).

TPU-native: one jitted train step fuses on-device augmentation + forward +
SupCon + optimizer update; the batch is sharded over the mesh 'data' axis
(replaces nn.DataParallel, :288-293) — embeddings are globally visible to
the contrastive loss exactly like the reference's gathered DataParallel
outputs.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from effocr_tpu.core.config import RecognizerTrainConfig
from effocr_tpu.data.folder import CharFolderDataset
from effocr_tpu.data.samplers import (
    HardNegativeClassSampler,
    NoReplacementMPerClassSampler,
    batch_iterator,
)
from effocr_tpu.data.transforms import augment_batch
from effocr_tpu.kernels.retrieval import knn_topk, l2_normalize
from effocr_tpu.retrieval.index import PrototypeIndex
from effocr_tpu.train import checkpoint as ckpt
from effocr_tpu.train.losses import (
    cosine_classifier_loss,
    cross_entropy_loss,
    supcon_loss,
)
from effocr_tpu.train.metrics import MetricsWriter


def make_train_step(model, cfg: RecognizerTrainConfig, tx,
                    classifier_mode: bool, mesh: Optional[Mesh] = None,
                    use_aux: bool = False, bank_mode: bool = False,
                    adjacent_bank: Optional[jnp.ndarray] = None):
    """Build the jitted (augment -> forward -> loss -> update) step.

    use_aux: optimize an auxiliary cosine-classifier head alongside SupCon
    (state carries "aux" = {"w": [C, D]} and opt_state covers the combined
    {"model", "aux"} tree).

    bank_mode: the dataset lives in HBM as a gray uint8 bank [N, S, S]
    (+ per-item targets/paired arrays); the step takes int32 indices and
    gathers on device.  This keeps the host->device link traffic per step
    at ~1 KB — on this environment the transport retains every transfer
    buffer (host RSS grows by the payload), so streaming pixel batches
    OOMs long runs; it is also simply the right TPU design for datasets
    that fit in HBM.
    """

    channels = getattr(cfg.encoder, "input_channels", 3)

    def prepare(images_u8, is_paired, key):
        if images_u8.ndim == 3:  # gray bank rows -> RGB
            images_u8 = jnp.repeat(images_u8[..., None], 3, axis=-1)
        return augment_batch(
            images_u8, is_paired, key, lang=cfg.lang,
            high_blur=cfg.high_blur, no_aug=cfg.no_aug,
            crop_sim=cfg.crop_sim, adjacent_bank=adjacent_bank,
            paired_jitter=getattr(cfg, "paired_jitter", 0.0),
            out_channels=channels,
        )

    def body(state, x, targets, key):

        def loss_fn(trainable):
            params = trainable["model"] if use_aux else trainable
            variables = {"params": params}
            if state["batch_stats"]:
                variables["batch_stats"] = state["batch_stats"]
                out, mut = model.apply(
                    variables, x, train=True, mutable=["batch_stats"],
                    rngs={"dropout": key},
                )
                new_stats = mut["batch_stats"]
            else:
                out = model.apply(variables, x, train=True,
                                  rngs={"dropout": key})
                new_stats = state["batch_stats"]
            if classifier_mode:
                loss = cross_entropy_loss(out, targets)
            else:
                loss = supcon_loss(out, targets, cfg.temperature)
                if use_aux:
                    loss = loss + cfg.aux_ce_weight * cosine_classifier_loss(
                        out, trainable["aux"]["w"], targets, cfg.aux_ce_temp
                    )
            return loss, new_stats

        if use_aux:
            trainable = {"model": state["params"], "aux": state["aux"]}
        else:
            trainable = state["params"]
        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(trainable)
        updates, new_opt = tx.update(grads, state["opt_state"], trainable)
        new_trainable = optax.apply_updates(trainable, updates)
        new_state = {
            "params": new_trainable["model"] if use_aux else new_trainable,
            "batch_stats": new_stats,
            "opt_state": new_opt,
        }
        if use_aux:
            new_state["aux"] = new_trainable["aux"]
        return new_state, loss

    def step(state, images_u8, targets, is_paired, key):
        return body(state, prepare(images_u8, is_paired, key), targets, key)

    def step_bank(state, bank, bank_targets, bank_paired, idx, key):
        images_u8 = jnp.take(bank, idx, axis=0)
        targets = jnp.take(bank_targets, idx, axis=0)
        is_paired = jnp.take(bank_paired, idx, axis=0)
        return body(state, prepare(images_u8, is_paired, key), targets, key)

    if bank_mode:
        if mesh is not None:
            repl = NamedSharding(mesh, P())
            data = NamedSharding(mesh, P("data"))
            return jax.jit(
                step_bank,
                in_shardings=(repl, repl, repl, repl, data, repl),
                out_shardings=(repl, repl),
                donate_argnums=(0,),
            )
        return jax.jit(step_bank, donate_argnums=(0,))
    if mesh is not None:
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        return jax.jit(
            step,
            in_shardings=(repl, data, data, data, repl),
            out_shardings=(repl, repl),
            donate_argnums=(0,),
        )
    return jax.jit(step, donate_argnums=(0,))


class RecognizerTrainer:
    def __init__(
        self,
        cfg: RecognizerTrainConfig,
        model,
        run_dir: str,
        classifier_mode: bool = False,
        mesh: Optional[Mesh] = None,
        use_wandb: bool = False,
    ):
        self.cfg = cfg
        self.model = model
        self.run_dir = run_dir
        self.classifier_mode = classifier_mode
        self.mesh = mesh
        os.makedirs(run_dir, exist_ok=True)
        self.metrics = MetricsWriter(run_dir, use_wandb=use_wandb)

        self.use_aux = (not classifier_mode) and cfg.aux_ce_weight > 0
        self._adjacent_bank = None
        if cfg.adjacent_font_path:
            from effocr_tpu.data.fonts import render_adjacent_bank

            bank = render_adjacent_bank(
                cfg.adjacent_font_path, cfg.encoder.image_size, cfg.lang
            )
            self._adjacent_bank = jnp.asarray(bank)
            if mesh is not None:
                self._adjacent_bank = jax.device_put(
                    self._adjacent_bank, NamedSharding(mesh, P())
                )
        self.tx = optax.adamw(cfg.lr, weight_decay=cfg.weight_decay)
        self._step_fn = make_train_step(
            model, cfg, self.tx, classifier_mode, mesh, use_aux=False,
            adjacent_bank=self._adjacent_bank,
        )
        self._embed_fn = jax.jit(
            lambda variables, x: model.apply(variables, x, train=False)
        )

        def embed_bank(variables, bank, idx):
            from effocr_tpu.kernels.image_ops import normalize_imagenet

            g = jnp.take(bank, idx, axis=0).astype(jnp.float32) / 255.0
            ch = getattr(cfg.encoder, "input_channels", 3)
            x = g[..., None] if ch == 1 else jnp.repeat(
                g[..., None], 3, axis=-1
            )
            return model.apply(variables, normalize_imagenet(x), train=False)

        self._embed_bank_fn = jax.jit(embed_bank)
        self.bank = None            # HBM-resident gray dataset (see
        self._bank_targets = None   # make_train_step bank_mode)
        self._bank_paired = None
        self.state = None
        self.best_acc = -1.0

    # ------------------------------------------------------------- schedule
    def _build_optimizer(self, total_steps: int):
        """(Re)build tx + step_fn once the step count is known; reset
        opt_state over the current params (and aux head, if enabled)."""
        cfg = self.cfg
        if cfg.lr_schedule == "cosine":
            warmup = max(int(cfg.warmup_frac * total_steps), 0)
            lr = optax.warmup_cosine_decay_schedule(
                init_value=0.0 if warmup else cfg.lr,
                peak_value=cfg.lr,
                warmup_steps=warmup,
                decay_steps=max(total_steps, 1),
                end_value=cfg.lr * cfg.min_lr_frac,
            )
        else:
            lr = cfg.lr
        def adamw(mult=1.0):
            scaled = (
                lr if isinstance(lr, float) and mult == 1.0 else
                ((lambda s: lambda t: s(t) * mult)(lr) if callable(lr)
                 else lr * mult)
            )
            return optax.adamw(scaled, b2=cfg.adam_b2,
                               weight_decay=cfg.weight_decay)

        if self.use_aux and cfg.aux_lr_mult != 1.0:
            self.tx = optax.multi_transform(
                {"model": adamw(), "aux": adamw(cfg.aux_lr_mult)},
                param_labels={"model": "model", "aux": "aux"},
            )
        else:
            self.tx = adamw()
        self._step_fn = make_train_step(
            self.model, cfg, self.tx, self.classifier_mode, self.mesh,
            use_aux=self.use_aux, bank_mode=self.bank is not None,
            adjacent_bank=self._adjacent_bank,
        )
        if self.use_aux:
            trainable = {"model": self.state["params"],
                         "aux": self.state["aux"]}
        else:
            trainable = self.state["params"]
        opt_state = self.tx.init(trainable)
        if self.mesh is not None:
            opt_state = jax.device_put(
                opt_state, NamedSharding(self.mesh, P())
            )
        self.state = dict(self.state)
        self.state["opt_state"] = opt_state

    def _init_aux(self, n_classes: int, key: jax.Array,
                  dataset: Optional[CharFolderDataset] = None,
                  seed_idx: Optional[Sequence[int]] = None):
        """Cosine-classifier proxy matrix [C, D]; D probed via eval_shape.

        cfg.aux_init == "embed": rows seeded from one item per class
        embedded by the current encoder (seed_idx: dataset index per class,
        ordered by class target).  Random proxies at 10k+ classes update
        too rarely to organize and the CE drowns SupCon in noise;
        embedding-seeded rows give a coherent objective from step one."""
        size = self.cfg.encoder.image_size
        ch = getattr(self.cfg.encoder, "input_channels", 3)
        out = jax.eval_shape(
            lambda v, x: self.model.apply(v, x, train=False),
            self.variables, jnp.zeros((1, size, size, ch), jnp.float32),
        )
        d = out.shape[-1]
        w = np.array(
            jax.random.normal(key, (n_classes, d), jnp.float32) * 0.02
        )
        if (self.cfg.aux_init == "embed" and dataset is not None
                and seed_idx is not None):
            embs, labs = self.embed_indices(dataset, list(seed_idx))
            embs = embs / np.maximum(
                np.linalg.norm(embs, axis=1, keepdims=True), 1e-12
            )
            w[np.asarray(labs)] = embs
        w = jnp.asarray(w)
        if self.mesh is not None:
            w = jax.device_put(w, NamedSharding(self.mesh, P()))
        self.state = dict(self.state)
        self.state["aux"] = {"w": w}

    # ----------------------------------------------------------------- init
    def init_state(self, key: jax.Array, sample_shape=None):
        size = self.cfg.encoder.image_size
        ch = getattr(self.cfg.encoder, "input_channels", 3)
        x = jnp.zeros((2, size, size, ch), jnp.float32)
        variables = self.model.init(key, x, train=False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        self.state = {
            "params": params,
            "batch_stats": batch_stats,
            "opt_state": self.tx.init(params),
        }
        if self.mesh is not None:
            repl = NamedSharding(self.mesh, P())
            self.state = jax.device_put(self.state, repl)
        return self.state

    @property
    def variables(self):
        v = {"params": self.state["params"]}
        if self.state["batch_stats"]:
            v["batch_stats"] = self.state["batch_stats"]
        return v

    # ---------------------------------------------------------------- embed
    def attach_bank(self, dataset: CharFolderDataset) -> None:
        """Upload the whole dataset to HBM as a gray uint8 bank; training
        and eval then ship int32 indices only (make_train_step bank_mode)."""
        if self.bank is not None:
            return
        size = self.cfg.encoder.image_size
        bank = dataset.decode_all_gray(size)
        put = (
            (lambda a: jax.device_put(a, NamedSharding(self.mesh, P())))
            if self.mesh is not None else jax.device_put
        )
        self.bank = put(bank)
        self._bank_targets = put(np.asarray(dataset.targets, np.int32))
        self._bank_paired = put(
            np.asarray([dataset.is_paired(i) for i in range(len(dataset.data))],
                       bool)
        )

    def embed_indices(self, dataset: CharFolderDataset,
                      indices: Sequence[int], batch_size: int = 128
                      ) -> Tuple[np.ndarray, np.ndarray]:
        """Embeddings + labels for dataset items (paired transform path)."""
        size = self.cfg.encoder.image_size
        embs, labels = [], []
        from effocr_tpu.kernels.image_ops import normalize_imagenet

        for s in range(0, len(indices), batch_size):
            chunk = list(indices[s : s + batch_size])
            pad = batch_size - len(chunk)
            targets = np.asarray(
                [dataset.targets[i] for i in chunk], np.int32
            )
            if self.bank is not None:
                idx = np.asarray(chunk + [0] * pad, np.int32)
                out = np.asarray(
                    self._embed_bank_fn(self.variables, self.bank,
                                        jnp.asarray(idx))
                )
            else:
                imgs, targets, _ = dataset.load_batch(chunk, size)
                if pad:
                    imgs = np.concatenate(
                        [imgs, np.zeros((pad,) + imgs.shape[1:], imgs.dtype)]
                    )
                if getattr(self.cfg.encoder, "input_channels", 3) == 1:
                    # truncating channel mean, matching the inference host
                    # prep (pipelines/infer.py _dispatch_chunk)
                    imgs = imgs.mean(axis=-1, keepdims=True).astype(np.uint8)
                x = normalize_imagenet(jnp.asarray(imgs, jnp.float32) / 255.0)
                out = np.asarray(self._embed_fn(self.variables, x))
            embs.append(out[: len(chunk)])
            labels.append(targets)
        return np.concatenate(embs), np.concatenate(labels)

    def class_centroids(self, dataset: CharFolderDataset,
                        indices: Sequence[int]
                        ) -> Tuple[np.ndarray, np.ndarray]:
        """L2-normalized per-class mean embeddings over (capped) indices.

        Returns (centroids [C', D], class targets [C']) for the classes
        present in indices.  Robust prototype source when the single clean
        render sits off-cluster under from-scratch training."""
        cap = self.cfg.centroid_cap
        by_class: Dict[int, List[int]] = {}
        for i in indices:
            by_class.setdefault(dataset.targets[i], []).append(i)
        sel = [i for t in sorted(by_class) for i in by_class[t][:cap]]
        embs, labs = self.embed_indices(dataset, sel)
        embs = embs / np.maximum(
            np.linalg.norm(embs, axis=1, keepdims=True), 1e-12
        )
        targets = np.asarray(sorted(by_class), np.int32)
        pos = {int(t): j for j, t in enumerate(targets)}
        cents = np.zeros((len(targets), embs.shape[1]), np.float32)
        np.add.at(cents, [pos[int(t)] for t in labs], embs)
        cents /= np.maximum(
            np.linalg.norm(cents, axis=1, keepdims=True), 1e-12
        )
        return cents, targets

    # ----------------------------------------------------------------- eval
    def eval_knn(self, dataset: CharFolderDataset,
                 query_idx: Sequence[int], ref_idx: Sequence[int],
                 ref_emb: Optional[np.ndarray] = None,
                 ref_lab: Optional[np.ndarray] = None) -> float:
        """Precision@1 of query items against reference (render) items —
        tester_knn semantics (train_effocr_recognizer.py:81-102).  Pass
        (ref_emb, ref_lab) to evaluate against precomputed prototypes
        (e.g. class centroids) instead of embedding ref_idx."""
        if len(query_idx) == 0:
            return 0.0
        if ref_emb is None:
            if len(ref_idx) == 0:
                return 0.0
            ref_emb, ref_lab = self.embed_indices(dataset, ref_idx)
        q_emb, q_lab = self.embed_indices(dataset, query_idx)
        _, nn_idx = knn_topk(
            jnp.asarray(q_emb),
            l2_normalize(jnp.asarray(ref_emb)),
            k=1,
        )
        pred = np.asarray(ref_lab)[np.asarray(nn_idx)[:, 0]]
        return float((pred == q_lab).mean())

    def eval_classifier(self, dataset: CharFolderDataset,
                        indices: Sequence[int]) -> float:
        """Classifier accuracy (tester_ffnn, train_effocr_recognizer.py:105-123)."""
        logits, labels = self.embed_indices(dataset, indices)
        return float((logits.argmax(-1) == labels).mean())

    # ------------------------------------------------------------------ fit
    def fit(
        self,
        dataset: CharFolderDataset,
        idx_train: Sequence[int],
        idx_val: Sequence[int],
        render_ref_idx: Sequence[int],
        hardnegs: Optional[Sequence[str]] = None,
        resume: bool = False,
    ) -> float:
        """resume: restore last.msgpack (full train state incl. optimizer)
        + last_meta.json and continue from the recorded epoch — the
        localizer trainer's resume story for the recognizer.  The PRNG
        stream is folded per epoch, so a resumed run sees the same
        augmentation keys an uninterrupted run would."""
        cfg = self.cfg
        key = jax.random.PRNGKey(cfg.seed)
        if self.state is None:
            self.init_state(key)
        if cfg.data_device == "resident":
            self.attach_bank(dataset)

        train_labels = [dataset.targets[i] for i in idx_train]
        local_of_global = {g: i for i, g in enumerate(idx_train)}

        def make_sampler(epoch):
            if hardnegs:
                return HardNegativeClassSampler(
                    train_labels, dataset.class_to_idx, hardnegs,
                    m=cfg.m_per_class, batch_size=cfg.batch_size,
                    num_passes=cfg.num_passes, seed=cfg.seed + epoch,
                )
            return NoReplacementMPerClassSampler(
                train_labels, m=cfg.m_per_class, batch_size=cfg.batch_size,
                num_passes=cfg.num_passes, seed=cfg.seed + epoch,
            )

        def evaluate():
            if self.classifier_mode:
                return self.eval_classifier(dataset, idx_val)
            if cfg.ref_source == "centroid":
                cents, targets = self.class_centroids(dataset, idx_train)
                return self.eval_knn(dataset, idx_val, [],
                                     ref_emb=cents, ref_lab=targets)
            return self.eval_knn(dataset, idx_val, render_ref_idx)

        # steps/epoch from the epoch-0 sampler -> lr schedule + aux head
        steps_per_epoch = sum(
            1 for _ in batch_iterator(iter(make_sampler(0)), cfg.batch_size)
        )
        total_steps = steps_per_epoch * cfg.num_epochs
        if total_steps < 200:
            # m-per-class epochs scale with the CLASS count, not the crop
            # count (m * n_classes * num_passes, recognizer_samplers.py:9-70)
            # — at small charsets an "epoch" is a couple of optimizer steps
            # and a from-scratch run silently undertrains (en demo: 32 steps
            # -> val p@1 0.53; x20 passes -> 0.999 with zero code changes).
            print(
                f"WARNING: only {total_steps} total optimizer steps "
                f"({steps_per_epoch}/epoch: m={cfg.m_per_class} x "
                f"{len(set(train_labels))} classes, num_passes="
                f"{cfg.num_passes}); from-scratch training needs hundreds "
                f"— raise --num_passes or --num_epochs"
            )
        if self.use_aux:
            key, aux_key = jax.random.split(key)
            first_of_class: Dict[int, int] = {}
            for i in idx_train:          # renders come first (sorted paths)
                first_of_class.setdefault(dataset.targets[i], i)
            self._init_aux(
                len(dataset.class_to_idx), aux_key, dataset=dataset,
                seed_idx=[first_of_class[t] for t in sorted(first_of_class)],
            )
        self._build_optimizer(steps_per_epoch * cfg.num_epochs)

        start_epoch, step = 0, 0
        last_path = os.path.join(self.run_dir, "last.msgpack")
        meta_path = os.path.join(self.run_dir, "last_meta.json")
        if resume:
            if os.path.exists(last_path) and os.path.exists(meta_path):
                import json as _json

                self.state = ckpt.load_train_state(self.state, last_path)
                with open(meta_path) as f:
                    meta = _json.load(f)
                start_epoch = int(meta["epoch"])
                step = int(meta["step"])
                self.best_acc = float(meta["best_acc"])
                self.metrics.log({"resumed_epoch": start_epoch}, step=step)
            elif os.path.exists(ckpt.best_checkpoint_path(self.run_dir)):
                # prior artifacts exist but no resumable state: training
                # from scratch here would silently overwrite them
                raise FileNotFoundError(
                    f"--resume: no {last_path} / {meta_path}, but "
                    f"{self.run_dir} already holds a best checkpoint — "
                    "refusing to restart from scratch over it (point at "
                    "the right run_dir, or remove enc_best.msgpack to "
                    "really start over)"
                )
            else:
                print(f"--resume: nothing to restore in {self.run_dir}; "
                      "starting fresh")

        if start_epoch == 0:
            self.best_acc = evaluate()
            self.metrics.log({"val/accuracy": self.best_acc}, step=0)
            self._save_best()

        def _save_last(epoch_done):
            import json as _json

            ckpt.save_train_state(self.state, last_path)
            with open(meta_path + ".tmp", "w") as f:
                _json.dump({"epoch": epoch_done + 1, "step": step,
                            "best_acc": float(self.best_acc)}, f)
            os.replace(meta_path + ".tmp", meta_path)

        size = cfg.encoder.image_size
        for epoch in range(start_epoch, cfg.num_epochs):
            sampler = make_sampler(epoch)
            # per-epoch PRNG fold: a resumed epoch replays the exact key
            # stream of an uninterrupted run
            key = jax.random.fold_in(jax.random.PRNGKey(cfg.seed), epoch + 1)
            for batch_local in batch_iterator(iter(sampler), cfg.batch_size):
                global_idx = [idx_train[i] for i in batch_local]
                key, sub = jax.random.split(key)
                if self.bank is not None:
                    self.state, loss = self._step_fn(
                        self.state, self.bank, self._bank_targets,
                        self._bank_paired,
                        jnp.asarray(np.asarray(global_idx, np.int32)), sub,
                    )
                else:
                    imgs, targets, paired = dataset.load_batch(
                        global_idx, size
                    )
                    self.state, loss = self._step_fn(
                        self.state, jnp.asarray(imgs), jnp.asarray(targets),
                        jnp.asarray(paired), sub,
                    )
                if step % 50 == 0:
                    self.metrics.log(
                        {"train/loss": float(loss)}, step=step
                    )
                step += 1
            if (epoch + 1) % max(cfg.eval_period_epochs, 1) == 0 or (
                epoch == cfg.num_epochs - 1
            ):
                acc = evaluate()
                self.metrics.log({"val/accuracy": acc}, step=step)
                if acc >= self.best_acc:
                    self.best_acc = acc
                    self._save_best()
            _save_last(epoch)
        return self.best_acc

    def _save_best(self):
        ckpt.save_variables(
            self.variables, ckpt.best_checkpoint_path(self.run_dir)
        )

    def load_best(self):
        path = ckpt.best_checkpoint_path(self.run_dir)
        self.state = dict(self.state)
        loaded = ckpt.load_variables(self.variables, path)
        self.state["params"] = loaded["params"]
        if "batch_stats" in loaded:
            self.state["batch_stats"] = loaded["batch_stats"]

    # ------------------------------------------------------------ artifacts
    def build_ref_index(self, dataset: CharFolderDataset,
                        render_idx: Sequence[int],
                        thumbnail_size: int = 64,
                        centroid_idx: Optional[Sequence[int]] = None,
                        ) -> PrototypeIndex:
        """Embed the prototype set into ref.npz/ref.txt
        (save_ref_index, train_effocr_recognizer.py:47-62).  Grayscale
        thumbnails of each prototype ride along for the kNN visualizer.

        cfg.ref_source == "centroid": one row per class, the L2-normalized
        mean embedding over centroid_idx (default: the render set);
        thumbnail = the first render of that class."""
        if self.cfg.ref_source == "centroid":
            src = centroid_idx if centroid_idx is not None else render_idx
            embs, targets = self.class_centroids(dataset, src)
            chars = [dataset.char_for_target(int(t)) for t in targets]
            first_render = {}
            for i in render_idx:
                first_render.setdefault(dataset.targets[i], i)
            thumbs = np.stack([
                dataset.load_square(
                    first_render.get(int(t), src[0]), thumbnail_size
                ).mean(-1).astype(np.uint8)
                for t in targets
            ]) if len(targets) else None
        else:
            embs, _ = self.embed_indices(dataset, render_idx)
            chars = [
                dataset.char_for_path(dataset.data[i][0]) for i in render_idx
            ]
            thumbs = np.stack([
                dataset.load_square(i, thumbnail_size).mean(-1)
                .astype(np.uint8)
                for i in render_idx
            ]) if render_idx else None
        index = PrototypeIndex(embs, chars, thumbnails=thumbs)
        index.save(self.run_dir)
        return index

    def infer_hardneg(self, dataset: CharFolderDataset,
                      query_idx: Sequence[int], index: PrototypeIndex,
                      k: int = 8) -> List[str]:
        """k-NN hard-negative strings, written to hns.txt
        (infer_hardneg, train_effocr_recognizer.py:25-44)."""
        q_emb, _ = self.embed_indices(dataset, query_idx)
        lines = index.decode(q_emb, k=k)
        with open(os.path.join(self.run_dir, "hns.txt"), "w") as f:
            f.write("\n".join(lines))
        return lines
