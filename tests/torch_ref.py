"""Independent torch reference UNet for end-to-end numerical parity.

A functional torch (NCHW) re-implementation of the SD UNet architecture
that consumes our flax params directly — an independent math path
(torch convs/linears/norms) over the same weights, standing in for the
diffusers reference the image lacks (BASELINE.json north star: per-step
latent parity atol 1e-3 vs hcpdiff/utils/pipe_hook.py:118-153's loop).
Not a copy of diffusers code: written from the architecture spec in
hcpdiff_tpu/models/unet.py.
"""
import math

import numpy as np
import torch
import torch.nn.functional as F


def _t(x):
    return torch.tensor(np.asarray(x), dtype=torch.float32)


def _conv(x, p, stride=1, padding=1):
    w = _t(p['kernel']).permute(3, 2, 0, 1)
    return F.conv2d(x, w, _t(p['bias']), stride=stride, padding=padding)


def _dense(x, p, bias=True):
    return F.linear(x, _t(p['kernel']).T, _t(p['bias']) if bias else None)


def _gn(x, p, groups, eps=1e-5):
    return F.group_norm(x, groups, _t(p['scale']), _t(p['bias']), eps=eps)


def _ln(x, p):
    return F.layer_norm(x, (x.shape[-1],), _t(p['scale']), _t(p['bias']))


def _timestep_embedding(t, dim, max_period=10000.0):
    half = dim // 2
    freqs = torch.exp(-math.log(max_period)
                      * torch.arange(half, dtype=torch.float32) / half)
    args = t.float()[:, None] * freqs[None]
    emb = torch.cat([torch.sin(args), torch.cos(args)], dim=-1)
    return torch.cat([emb[:, half:], emb[:, :half]], dim=-1)  # flip sin/cos


def _resnet(x, temb, p, groups):
    h = F.silu(_gn(x, p['norm1'], groups))
    h = _conv(h, p['conv1'])
    t = _dense(F.silu(temb), p['time_emb_proj'])
    h = h + t[:, :, None, None]
    h = F.silu(_gn(h, p['norm2'], groups))
    h = _conv(h, p['conv2'])
    if 'conv_shortcut' in p:
        x = _conv(x, p['conv_shortcut'], padding=0)
    return x + h


def _attention(x, ctx, p, heads):
    B, S, C = x.shape
    Sk = ctx.shape[1]
    d = C // heads
    q = _dense(x, p['to_q'], bias=False).view(B, S, heads, d).transpose(1, 2)
    k = _dense(ctx, p['to_k'], bias=False).view(B, Sk, heads, d).transpose(1, 2)
    v = _dense(ctx, p['to_v'], bias=False).view(B, Sk, heads, d).transpose(1, 2)
    attn = torch.softmax(q @ k.transpose(-1, -2) * d ** -0.5, dim=-1)
    o = (attn @ v).transpose(1, 2).reshape(B, S, C)
    return _dense(o, p['to_out'])


def _transformer_block(x, ctx, p, heads):
    x = x + _attention(_ln(x, p['norm1']), _ln(x, p['norm1']), p['attn1'], heads)
    x = x + _attention(_ln(x, p['norm2']), ctx, p['attn2'], heads)
    h = _dense(_ln(x, p['norm3']), p['ff']['proj'])
    h, gate = h.chunk(2, dim=-1)
    h = h * F.gelu(gate, approximate='none')
    return x + _dense(h, p['ff']['out'])


def _transformer2d(x, ctx, p, heads, depth, groups):
    B, C, H, W = x.shape
    res = x
    h = _gn(x, p['norm'], groups, eps=1e-6)
    h = h.permute(0, 2, 3, 1).reshape(B, H * W, C)
    h = _dense(h, p['proj_in'])
    for i in range(depth):
        h = _transformer_block(h, ctx, p[f'transformer_blocks_{i}'], heads)
    h = _dense(h, p['proj_out'])
    return h.reshape(B, H, W, C).permute(0, 3, 1, 2) + res


@torch.no_grad()
def torch_unet_forward(params, cfg, sample, timesteps, ctx,
                       pooled_text_emb=None, time_ids=None):
    """sample: [B,H,W,C] (NHWC like ours), ctx: [B,S,D] — returns NHWC.

    SDXL text_time conditioning (reference: diffusers add_embedding;
    hcpdiff SDXL wrapper models/compose) via pooled_text_emb [B,1280-like]
    + time_ids [B,6]."""
    p = params
    x = _t(sample).permute(0, 3, 1, 2)
    ctx = _t(ctx)
    t = torch.tensor(np.asarray(timesteps))
    if t.dim() == 0:
        t = t.expand(x.shape[0])

    temb = _timestep_embedding(t, cfg.block_out_channels[0])
    temb = _dense(temb, p['time_embedding_linear_1'])
    temb = _dense(F.silu(temb), p['time_embedding_linear_2'])

    if getattr(cfg, 'addition_embed_type', None) == 'text_time':
        B = x.shape[0]
        tid = torch.tensor(np.asarray(time_ids)).reshape(-1)
        t_emb = _timestep_embedding(tid, cfg.addition_time_embed_dim)
        t_emb = t_emb.reshape(B, -1)
        add = torch.cat([_t(pooled_text_emb).float(), t_emb], dim=-1)
        add = _dense(add, p['add_embedding_linear_1'])
        add = _dense(F.silu(add), p['add_embedding_linear_2'])
        temb = temb + add

    x = _conv(x, p['conv_in'])
    skips = [x]
    n_blocks = len(cfg.block_out_channels)
    for bi, (btype, out_c) in enumerate(zip(cfg.down_block_types,
                                            cfg.block_out_channels)):
        for li in range(cfg.layers_per_block):
            x = _resnet(x, temb, p[f'down_{bi}_res_{li}'], cfg.norm_num_groups)
            if btype == 'CrossAttnDownBlock2D':
                x = _transformer2d(x, ctx, p[f'down_{bi}_attn_{li}'],
                                   cfg.num_heads[bi],
                                   cfg.transformer_layers_per_block[bi],
                                   cfg.norm_num_groups)
            skips.append(x)
        if bi < n_blocks - 1:
            xp = F.pad(x, (0, 1, 0, 1))
            x = _conv(xp, p[f'down_{bi}_downsample']['conv'], stride=2,
                      padding=0)
            skips.append(x)

    x = _resnet(x, temb, p['mid_res_0'], cfg.norm_num_groups)
    if cfg.mid_cross_attn:
        x = _transformer2d(x, ctx, p['mid_attn'], cfg.num_heads[-1],
                           cfg.transformer_layers_per_block[-1],
                           cfg.norm_num_groups)
    x = _resnet(x, temb, p['mid_res_1'], cfg.norm_num_groups)

    rev = list(reversed(cfg.block_out_channels))
    for bi, btype in enumerate(cfg.up_block_types):
        for li in range(cfg.layers_per_block + 1):
            skip = skips.pop()
            x = torch.cat([x, skip], dim=1)
            x = _resnet(x, temb, p[f'up_{bi}_res_{li}'], cfg.norm_num_groups)
            if btype == 'CrossAttnUpBlock2D':
                hi = len(rev) - 1 - bi
                x = _transformer2d(x, ctx, p[f'up_{bi}_attn_{li}'],
                                   cfg.num_heads[hi],
                                   cfg.transformer_layers_per_block[hi],
                                   cfg.norm_num_groups)
        if bi < len(cfg.up_block_types) - 1:
            x = F.interpolate(x, scale_factor=2, mode='nearest')
            x = _conv(x, p[f'up_{bi}_upsample']['conv'])

    x = F.silu(_gn(x, p['conv_norm_out'], cfg.norm_num_groups))
    x = _conv(x, p['conv_out'])
    return x.permute(0, 2, 3, 1).numpy()
