"""Execute the REFERENCE training loop end-to-end and record everything needed
to replay it through team_tpu (VERDICT round-2 item 2: full-LOOP parity).

The reference's real ``trainer._train`` (``/root/reference/trainer.py:24-138``)
runs on torch CPU over a synthetic nested ``class/stage/img`` JPEG directory,
with a tiny open_clip-spec torch CLIP standing in for the laion400m backbone
(``utils/inc_net.py:12-36`` ``get_convnet`` is monkeypatched — exactly the
"one monkeypatch away" route the round-2 verdict prescribed). The SAME backbone
weights are converted to the JAX towers (via the pinned
``convert_openclip_state_dict`` mapping), so both systems share L0 exactly.

Harness-controlled divergences (each removes an RNG-only or environment-only
difference, never an orchestration difference):

* ``torchvision`` is not installed in this image; a PIL-backed stub implements
  the transforms the reference executes (Resize-bicubic / CenterCrop /
  ToTensor / Normalize / flip) with torchvision's exact semantics — the same
  PIL calls team_tpu's ``data/transforms.py`` makes, so pixels match bitwise.
* ``nn.Dropout.p`` is forced to 0 in the reference network and the team fusion
  runs deterministically: dropout masks are the one place where torch/jax RNG
  streams cannot be aligned.
* DataLoaders run ``num_workers=0`` and the train loader's per-epoch batch
  order is RECORDED; team_tpu replays it via ``Learner._order_override`` so
  both systems consume identical batches.
* Per-task parameter initializations (projections, context prompts, fusion
  attention, state embeddings, temporal GCN, logit_scale) are captured at
  their creation points and transplanted into team_tpu's preallocated banks.

Everything else — epoch cadence, evolution call sequence, herding, replay
memory, distance-matrix merges, LR schedule, optimizer — runs through each
system's own orchestration code and is what the comparison tests.
"""

from __future__ import annotations

import json
import os
import sys
import types
from typing import Dict, List

import numpy as np

REF = "/root/reference"


# ---------------------------------------------------------------------------
# stubs for modules the reference imports but this image lacks
# ---------------------------------------------------------------------------

def install_reference_stubs() -> None:
    os.environ.setdefault("MPLBACKEND", "Agg")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    sys.modules.setdefault("timm", types.ModuleType("timm"))
    if "torchvision" in sys.modules:
        return

    import torch
    from PIL import Image

    tv = types.ModuleType("torchvision")
    tf = types.ModuleType("torchvision.transforms")

    class InterpolationMode:
        BICUBIC = Image.BICUBIC
        BILINEAR = Image.BILINEAR
        NEAREST = Image.NEAREST

    class Compose:
        def __init__(self, transforms):
            self.transforms = list(transforms)

        def __call__(self, x):
            for t in self.transforms:
                x = t(x)
            return x

    class Resize:
        def __init__(self, size, interpolation=Image.BILINEAR):
            self.size = size
            self.interpolation = interpolation

        def __call__(self, img):
            if isinstance(self.size, int):
                w, h = img.size
                if w < h:
                    ow, oh = self.size, max(1, int(round(self.size * h / w)))
                else:
                    oh, ow = self.size, max(1, int(round(self.size * w / h)))
                return img.resize((ow, oh), self.interpolation)
            h, w = self.size
            return img.resize((w, h), self.interpolation)

    class CenterCrop:
        def __init__(self, size):
            self.size = (size, size) if isinstance(size, int) else tuple(size)

        def __call__(self, img):
            w, h = img.size
            th, tw = self.size
            left = int(round((w - tw) / 2.0))
            top = int(round((h - th) / 2.0))
            return img.crop((left, top, left + tw, top + th))

    class ToTensor:
        def __call__(self, img):
            arr = np.asarray(img, dtype=np.float32) / 255.0
            if arr.ndim == 2:
                arr = arr[:, :, None]
            return torch.from_numpy(arr.transpose(2, 0, 1).copy())

    class Normalize:
        def __init__(self, mean, std):
            self.mean = torch.tensor(mean, dtype=torch.float32).view(-1, 1, 1)
            self.std = torch.tensor(std, dtype=torch.float32).view(-1, 1, 1)

        def __call__(self, t):
            return (t - self.mean) / self.std

    class RandomHorizontalFlip:
        def __init__(self, p=0.5):
            self.p = p

        def __call__(self, img):
            if self.p >= 1.0 or (self.p > 0 and float(torch.rand(1)) < self.p):
                return img.transpose(Image.FLIP_LEFT_RIGHT)
            return img

    class _DeclOnly:
        """Transforms instantiated at iData class-body time but never executed
        in the IIMinsects protocol."""

        def __init__(self, *a, **k):
            pass

        def __call__(self, img):  # pragma: no cover
            raise NotImplementedError("stub transform executed unexpectedly")

    tf.InterpolationMode = InterpolationMode
    tf.Compose = Compose
    tf.Resize = Resize
    tf.CenterCrop = CenterCrop
    tf.ToTensor = ToTensor
    tf.Normalize = Normalize
    tf.RandomHorizontalFlip = RandomHorizontalFlip
    tf.RandomResizedCrop = _DeclOnly
    tf.RandomCrop = _DeclOnly
    tf.ColorJitter = _DeclOnly
    tv.transforms = tf
    tv.datasets = types.ModuleType("torchvision.datasets")
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tf
    sys.modules["torchvision.datasets"] = tv.datasets


# ---------------------------------------------------------------------------
# tiny shared backbone
# ---------------------------------------------------------------------------

def make_tiny_backbone(seed: int = 7, cfg=None):
    """Build the torch open_clip-spec CLIP + its converted JAX params
    (``cfg`` defaults to the tiny test config; pass
    ``CLIPConfig.vit_b16()`` for the full-width parity run).

    Returns (torch_model, jax_params, clip_cfg, tokenizer_callable)."""
    import torch

    from team_tpu.backbone.clip import CLIPConfig
    from team_tpu.backbone.import_weights import convert_openclip_state_dict
    from team_tpu.backbone.tokenizer import Tokenizer
    from test_weight_import import TorchCLIP, openclip_state_dict

    if cfg is None:
        cfg = CLIPConfig.tiny()
    torch.manual_seed(seed)
    model = TorchCLIP(cfg).eval()
    model.logit_scale = torch.nn.Parameter(
        torch.ones([]) * float(np.log(1.0 / 0.07)))
    model.out_dim = cfg.embed_dim

    base_encode_image = model.encode_image
    base_encode_text = model.encode_text

    def encode_image(x, normalize: bool = False):
        f = base_encode_image(x)
        return torch.nn.functional.normalize(f, dim=-1) if normalize else f

    def encode_text(t, normalize: bool = False):
        f = base_encode_text(t)
        return torch.nn.functional.normalize(f, dim=-1) if normalize else f

    model.encode_image = encode_image
    model.encode_text = encode_text

    sd = openclip_state_dict(model)
    sd["logit_scale"] = np.asarray(float(model.logit_scale.detach()), np.float32)
    jax_params = convert_openclip_state_dict(sd, cfg)

    team_tok = Tokenizer()

    def tokenizer(texts):
        return torch.from_numpy(np.asarray(team_tok(texts), dtype=np.int64))

    return model, jax_params, cfg, tokenizer


# ---------------------------------------------------------------------------
# synthetic nested JPEG dataset (read by BOTH loaders)
# ---------------------------------------------------------------------------

def write_nested_dataset(root: str, num_classes: int = 6, img_size: int = 32,
                         train_per_stage: int = 4, test_per_stage: int = 2,
                         seed: int = 3) -> List[str]:
    """``root/{train,test}/<class name>/<stage>/<unique>.jpg``; class folders are
    named with the first ``num_classes`` iiminsects202 labels (alphabetical, so
    sorted-walk ids == labels.json indices on both sides). Basenames are
    globally unique (the reference's stage lookup is basename-keyed,
    ``utils/data_manager.py:505-516``)."""
    from PIL import Image

    with open(os.path.join(REF, "utils", "labels.json")) as f:
        labels = json.load(f)["iiminsects202"][:num_classes]
    assert labels == sorted(labels), "folder sort order must match label order"
    rng = np.random.default_rng(seed)
    stage_sets = [(1, 2, 4), (3, 4)]
    for split, per_stage in (("train", train_per_stage), ("test", test_per_stage)):
        for ci, cname in enumerate(labels):
            for stage in stage_sets[ci % 2]:
                d = os.path.join(root, split, cname, str(stage))
                os.makedirs(d, exist_ok=True)
                for i in range(per_stage):
                    base = np.full((img_size, img_size, 3),
                                   [40 * ci + 20, 25 * stage + 30, (ci * stage * 7) % 200],
                                   dtype=np.float32)
                    noise = rng.normal(0, 25, base.shape)
                    arr = np.clip(base + noise, 0, 255).astype(np.uint8)
                    Image.fromarray(arr).save(
                        os.path.join(d, f"c{ci}_s{stage}_{split}_{i:03d}.jpg"))
    return labels


# ---------------------------------------------------------------------------
# reference protocol runner
# ---------------------------------------------------------------------------

class _RecordingLoader:
    def __init__(self, loader, orders):
        self._loader = loader
        self._orders = orders

    def __len__(self):
        return len(self._loader)

    @property
    def dataset(self):
        return self._loader.dataset

    def __iter__(self):
        idxs: List[np.ndarray] = []
        self._orders.append(idxs)
        for batch in self._loader:
            idxs.append(np.asarray(batch[0]))
            yield batch


def run_reference(data_root: str, sandbox: str, args: Dict, torch_model,
                  tokenizer, img_size: int = 32) -> Dict:
    """Run ``/root/reference`` ``trainer._train(args)`` with the injected
    backbone (tiny by default; ``img_size=224`` + a vit_b16 TorchCLIP for the
    full-width run); returns the full record (curves, losses, orders,
    per-task init params, dataset views)."""
    install_reference_stubs()
    import torch

    import trainer as ref_trainer  # noqa: F401 (reference module)
    import utils.data as ref_data
    import utils.inc_net as ref_inc_net
    import utils.factory as ref_factory
    import models.base as ref_base
    import models.proof as ref_proof
    from utils.toolkit import ClipLoss as RefClipLoss

    rec: Dict = {
        "tasks": [], "prompts": [], "orders": [], "loaders": [],
        "eval": [], "ce": [], "clip": [], "unicl": [],
        "train_views": [], "epoch_logs": [],
    }

    # --- dataset redirection -------------------------------------------------
    stub_tf = sys.modules["torchvision.transforms"]
    pipeline = [
        stub_tf.Resize((img_size, img_size), stub_tf.InterpolationMode.BICUBIC),
        stub_tf.CenterCrop((img_size, img_size)),
        stub_tf.ToTensor(),
        stub_tf.Normalize(mean=(0.48145466, 0.4578275, 0.40821073),
                          std=(0.26862954, 0.26130258, 0.27577711)),
    ]
    orig_attrs = {}
    cls = ref_data.IIMinsects202
    for name, val in (
        ("train_trsf", list(pipeline)), ("test_trsf", list(pipeline)),
        ("common_trsf", []), ("_data_loaded", False),
    ):
        orig_attrs[name] = getattr(cls, name)
        setattr(cls, name, val)

    def download_data(self):
        if getattr(self, "_data_loaded", False):
            return
        with open("./utils/templates.json", "r", encoding="utf-8") as f:
            self.state_mapping = json.load(f).get("states", {})
        self.train_data, self.train_targets, cmap, self.train_stages = \
            self.load_nested_dataset(os.path.join(data_root, "train"))
        self.test_data, self.test_targets, _, self.test_stages = \
            self.load_nested_dataset(os.path.join(data_root, "test"), class_map=cmap)
        self.class_map = cmap
        self.inverse_class_map = {v: k for k, v in cmap.items()}
        self._data_loaded = True

    orig_download = cls.download_data
    cls.download_data = download_data
    # the reference class_order is 20 long; trim to the synthetic class count
    orig_order = cls.class_order
    n_classes = len([d for d in os.listdir(os.path.join(data_root, "train"))])
    cls.class_order = list(range(n_classes))

    # --- backbone stub -------------------------------------------------------
    def get_convnet(cargs, pretrained=False):
        return torch_model, None, tokenizer

    orig_get_convnet = ref_inc_net.get_convnet
    ref_inc_net.get_convnet = get_convnet

    # --- loader recording + determinism -------------------------------------
    import torch.utils.data as tud

    def DataLoaderPatch(dataset, batch_size=1, shuffle=False, num_workers=0, **kw):
        real = tud.DataLoader(dataset, batch_size=batch_size, shuffle=shuffle,
                              num_workers=0, **kw)
        if shuffle:
            orders: List = []
            rec["loaders"].append({"dataset": dataset, "orders": orders})
            return _RecordingLoader(real, orders)
        return real

    orig_proof_dl, orig_base_dl = ref_proof.DataLoader, ref_base.DataLoader
    ref_proof.DataLoader = DataLoaderPatch
    ref_base.DataLoader = DataLoaderPatch

    # glob.glob order is OS-enumeration order (unspecified); team_tpu sorts.
    # Canonicalize to sorted during the reference walk so both walkers see the
    # same file order — environment normalization, not a behavior change.
    import glob as glob_mod

    orig_glob = glob_mod.glob

    def sorted_glob(*a, **k):
        return sorted(orig_glob(*a, **k))

    glob_mod.glob = sorted_glob

    # --- loss recording ------------------------------------------------------
    orig_unicl = ref_proof.unicl_loss

    def unicl_rec(*a, **k):
        out = orig_unicl(*a, **k)
        rec["unicl"].append(float(out[0].detach()))
        return out

    ref_proof.unicl_loss = unicl_rec

    class RecClipLoss(RefClipLoss):
        def forward(self, *a, **k):
            rec["_in_clip"] = True  # ClipLoss itself calls F.cross_entropy twice
            try:
                out = super().forward(*a, **k)
            finally:
                rec["_in_clip"] = False
            rec["clip"].append(float(out.detach()))
            return out

    orig_cliploss = ref_proof.ClipLoss
    ref_proof.ClipLoss = RecClipLoss

    orig_ce = torch.nn.functional.cross_entropy

    def ce_rec(*a, **k):
        out = orig_ce(*a, **k)
        if not rec.get("_in_clip"):
            rec["ce"].append(float(out.detach()))
        return out

    torch.nn.functional.cross_entropy = ce_rec

    # --- model wrapper: dropout off, init capture, eval capture --------------
    def t2np(t):
        # .numpy() ALIASES the live parameter; copy or the "captured init"
        # silently tracks in-place optimizer updates
        return np.array(t.detach().cpu().numpy(), dtype=np.float32, copy=True)

    def lin_np(mod):
        return {"w": t2np(mod.weight).T, "b": t2np(mod.bias)}

    def ln_np(mod):
        return {"scale": t2np(mod.weight), "bias": t2np(mod.bias)}

    def tgcn_np(g):
        return {
            "node_encoder": {**lin_np(g.node_encoder[0]), "ln": ln_np(g.node_encoder[1])},
            "time_encoder": {**lin_np(g.time_encoder[0]), "ln": ln_np(g.time_encoder[1])},
            "blocks": [
                {"message": {**lin_np(b.message_net[0]), "ln": ln_np(b.message_net[1])},
                 "update": {**lin_np(b.update_net[0]), "ln": ln_np(b.update_net[1])},
                 "gate": lin_np(b.temporal_gate[0])}
                for b in g.temporal_blocks
            ],
            "output_proj": lin_np(g.output_proj),
        }

    orig_get_model = ref_factory.get_model

    def get_model(name, margs):
        model = orig_get_model(name, margs)
        net = model._network
        for m in net.modules():
            if isinstance(m, torch.nn.Dropout):
                m.p = 0.0
        rec["init"] = {
            "sel_attn": {
                "w_qs": t2np(net.sel_attn.w_qs.weight).T,
                "w_ks": t2np(net.sel_attn.w_ks.weight).T,
                "w_vs": t2np(net.sel_attn.w_vs.weight).T,
                "fc_w": t2np(net.sel_attn.fc.weight).T,
                "fc_b": t2np(net.sel_attn.fc.bias),
                "ln": ln_np(net.sel_attn.layer_norm),
            },
            "state_embed": t2np(net.state_embedder.state_embeddings.weight),
            "temporal_gcn": tgcn_np(net.state_embedder.temporal_gcn),
            "logit_scale": float(net.convnet.logit_scale.detach()),
        }

        orig_extend = net.extend_task

        def extend_task():
            orig_extend()
            rec["tasks"].append({
                "proj_img": lin_np(net.projs_img[-1].MLP[0]),
                "proj_text": lin_np(net.projs_text[-1].MLP[0]),
                "proj_state": lin_np(net.projs_state[-1].MLP[0]),
            })

        net.extend_task = extend_task

        orig_ucp = net.update_context_prompt

        def update_context_prompt():
            orig_ucp()
            rec["prompts"].append(t2np(net.context_prompts[-1]))

        net.update_context_prompt = update_context_prompt

        orig_eval = model.eval_task

        def eval_task():
            out = orig_eval()
            rec["eval"].append({"cnn": out[0], "nme": out[1], "zs": out[2:]})
            # snapshot this task's train view for alignment checks / replay
            ds = model.train_dataset.dataset  # DummyDataset inside multimodal
            rec["train_views"].append({
                "paths": [str(p) for p in ds.images],
                "labels": np.asarray(ds.labels).copy(),
            })
            return out

        model.eval_task = eval_task
        rec["model"] = model
        return model

    ref_factory.get_model = get_model

    cwd = os.getcwd()
    try:
        os.chdir(sandbox)
        if not os.path.exists("utils"):
            os.symlink(os.path.join(REF, "utils"), "utils")
        ref_trainer._train(dict(args))
    finally:
        os.chdir(cwd)
        torch.nn.functional.cross_entropy = orig_ce
        ref_proof.unicl_loss = orig_unicl
        ref_proof.ClipLoss = orig_cliploss
        ref_proof.DataLoader = orig_proof_dl
        ref_base.DataLoader = orig_base_dl
        glob_mod.glob = orig_glob
        ref_inc_net.get_convnet = orig_get_convnet
        ref_factory.get_model = orig_get_model
        cls.download_data = orig_download
        cls.class_order = orig_order
        for name, val in orig_attrs.items():
            setattr(cls, name, val)

    model = rec.pop("model")
    rec["idata_train_paths"] = [str(p) for p in model.data_manager.idata.train_data]
    rec["class_to_label"] = list(model.data_manager._class_to_label)
    rec["class_order"] = list(model.data_manager._class_order)
    rec["memory_paths"] = [str(p) for p in np.asarray(model._data_memory).tolist()] \
        if len(getattr(model, "_data_memory", [])) else []
    # train-loader orders: shuffle=True loaders alternate train/protonet per task
    rec["train_orders"] = [rec["loaders"][2 * t]["orders"]
                           for t in range(len(rec["eval"]))]
    return rec


# ---------------------------------------------------------------------------
# team_tpu runner with reference-recorded injection
# ---------------------------------------------------------------------------

def make_injecting_learner(cfg, rec):
    """A team PROOF learner that (a) transplants the reference's per-task
    parameter initializations into the preallocated banks, (b) replays the
    reference's recorded per-epoch batch order, (c) reports per-epoch loss
    sums. Everything else is the production learner."""
    import jax
    import jax.numpy as jnp

    from team_tpu.learners.proof import Learner

    class InjectingLearner(Learner):
        def __init__(self, cfg):
            super().__init__(cfg)
            self._epoch_stats: List = []
            self._order_override = self._replayed_order
            self._epoch_stats_hook = lambda task, epoch, d: self._epoch_stats.append(
                (task, epoch, d))

        # -- batch-order replay ----------------------------------------
        def _replayed_order(self, task, epoch, n):
            global_idx = np.concatenate(rec["train_orders"][task][epoch])
            paths = rec["idata_train_paths"]
            row_of = {os.path.normpath(str(p)): i
                      for i, p in enumerate(self.train_dataset.images)}
            order = np.array([row_of[os.path.normpath(paths[g])] for g in global_idx])
            assert len(order) == n, (len(order), n)
            return order

        # -- parameter transplant --------------------------------------
        def _train_proj_with_replay(self):
            t = self._cur_task
            tr = dict(self.trainable)
            for name in ("proj_img", "proj_text", "proj_state"):
                w = np.array(tr[name]["w"])
                b = np.array(tr[name]["b"])
                w[t] = rec["tasks"][t][name]["w"]
                b[t] = rec["tasks"][t][name]["b"]
                tr[name] = {"w": jnp.asarray(w), "b": jnp.asarray(b)}
            cp = np.array(tr["context_prompts"])
            cp[t] = rec["prompts"][t]
            tr["context_prompts"] = jnp.asarray(cp)
            if t == 0:
                tr["sel_attn"] = jax.tree.map(jnp.asarray, rec["init"]["sel_attn"])
                tr["state_embed"] = jnp.asarray(rec["init"]["state_embed"])
                tr["logit_scale"] = jnp.asarray(rec["init"]["logit_scale"],
                                                jnp.float32)
                self.aux["temporal_gcn"] = jax.tree.map(
                    jnp.asarray, rec["init"]["temporal_gcn"])
            self.trainable = tr
            super()._train_proj_with_replay()

    return InjectingLearner(cfg)


def run_team(data_root: str, args: Dict, jax_params, rec,
             full_width: bool = False) -> Dict:
    """Replay the protocol through team_tpu (parity mode, f32, deterministic
    fusion to match the dropout-zeroed reference). ``full_width=True`` runs
    the REAL ViT-B/16 backbone config (VERDICT r4 item 4: width-dependent
    numerics — D=512 reductions, S=197 fusion forms — are invisible at tiny
    width)."""
    import team_tpu.learners.proof_net as proof_net
    from team_tpu.config import Config
    from team_tpu.data.manager import DataManager

    orig_fa = proof_net.fusion_attention

    def det_fa(params, x, key_mask, **kw):
        kw["deterministic"] = True
        kw["rng"] = None
        return orig_fa(params, x, key_mask, **kw)

    proof_net.fusion_attention = det_fa
    try:
        cfg = Config(
            prefix="parity",
            dataset="iiminsects202",
            model_name="proof",
            convnet_type="clip",
            init_cls=args["init_cls"],
            increment=args["increment"],
            memory_size=args["memory_size"],
            memory_per_class=args.get("memory_per_class", 40),
            fixed_memory=args.get("fixed_memory", False),
            tuned_epoch=args["tuned_epoch"],
            batch_size=args["batch_size"],
            init_lr=args["init_lr"],
            min_lr=args.get("min_lr", 0.0),
            weight_decay=args["weight_decay"],
            optimizer=args["optimizer"],
            context_prompt_length_per_task=args["context_prompt_length_per_task"],
            seed=[args["seed"]] if np.isscalar(args["seed"]) else list(args["seed"]),
            shuffle=args["shuffle"],
            log_dir="/tmp/team_parity_logs",
            compute_dtype="float32",
            attention_impl="xla",
            extras={} if full_width else {"tiny_backbone": True},
        )
        dm = DataManager("iiminsects202", shuffle=args["shuffle"],
                         seed=args["seed"] if np.isscalar(args["seed"]) else args["seed"][0],
                         init_cls=args["init_cls"], increment=args["increment"],
                         data_root=data_root)
        learner = make_injecting_learner(cfg, rec)
        learner.backbone.params = jax_params
        learner.backbone._text_cache.clear()
        out: Dict = {"eval": [], "class_to_label": list(dm._class_to_label),
                     "class_order": list(dm._class_order), "train_views": []}
        for task in range(dm.nb_tasks):
            learner.incremental_train(dm)
            cnn, nme, *zs = learner.eval_task()
            learner.after_task()
            learner.update_state_distance_matrix(dm)
            out["eval"].append({"cnn": cnn, "nme": nme, "zs": zs})
            out["train_views"].append({
                "paths": [str(p) for p in learner.train_dataset.images],
                "labels": np.asarray(learner.train_dataset.labels).copy(),
            })
        out["epoch_stats"] = learner._epoch_stats
        out["memory_paths"] = [str(p) for p in np.asarray(
            getattr(learner, "_data_memory", [])).tolist()]
        out["learner"] = learner
        return out
    finally:
        proof_net.fusion_attention = orig_fa
