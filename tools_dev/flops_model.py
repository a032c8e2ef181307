"""Analytic FLOP model for the SD UNet + VAE decode inference loop.

Used for the 768px/SDXL ceiling analysis (BASELINE.md round 4): breaks
per-image FLOPs into conv / projection-GEMM / attention(S^2) / other
buckets so measured throughput at different resolutions can be compared
against a per-bucket achieved-TF/s roofline calibrated at 512px.

Counts MACs*2 (multiply-adds) for one UNet eval, then scales by
2 (CFG) * steps, plus one VAE decode. Mirrors models/unet.py structure
(SD1.5/SD2.1/SDXL configs; reference: diffusers UNet2DConditionModel).

Usage: python tools_dev/flops_model.py [--model sd15|sdxl] [--size 512]
"""
import argparse
from dataclasses import dataclass, field


@dataclass
class Buckets:
    conv: float = 0.0        # 3x3/1x1 convs (resblocks, up/down, VAE)
    proj: float = 0.0        # transformer projections incl. ff
    attn: float = 0.0        # S^2 attention score+value matmuls
    other: float = 0.0       # time emb, text cross k/v, etc.

    def total(self):
        return self.conv + self.proj + self.attn + self.other

    def add(self, o):
        self.conv += o.conv
        self.proj += o.proj
        self.attn += o.attn
        self.other += o.other


def conv2d(h, w, cin, cout, k=3):
    return 2.0 * h * w * k * k * cin * cout


def resblock(h, w, cin, cout, temb=1280):
    b = Buckets()
    b.conv = conv2d(h, w, cin, cout) + conv2d(h, w, cout, cout)
    if cin != cout:
        b.conv += conv2d(h, w, cin, cout, k=1)
    b.other = 2.0 * temb * cout
    return b


def transformer(h, w, c, ctx_dim, n_layers, seq_ctx=77):
    s = h * w
    b = Buckets()
    # proj_in/out are 1x1 convs == GEMMs; count as proj
    b.proj += 2 * (2.0 * s * c * c)
    for _ in range(n_layers):
        # self-attn qkv + out
        b.proj += 4 * (2.0 * s * c * c)
        b.attn += 2 * (2.0 * s * s * c)
        # cross-attn: q + out on S, k/v on 77 tokens
        b.proj += 2 * (2.0 * s * c * c)
        b.other += 2 * (2.0 * seq_ctx * ctx_dim * c)
        b.attn += 2 * (2.0 * s * seq_ctx * c)
        # geglu ff: proj C->8C (two 4C halves), out 4C->C
        b.proj += 2.0 * s * c * 8 * c + 2.0 * s * 4 * c * c
    return b


def unet_flops(size, model='sd15'):
    """One UNet eval, batch 1."""
    lat = size // 8
    if model == 'sdxl':
        chans = (320, 640, 1280)
        tfl = (0, 2, 10)          # transformer layers/block (0 = no attn)
        ctx = 2048
    else:
        chans = (320, 640, 1280, 1280)
        tfl = (1, 1, 1, 0)
        ctx = 768
    n = len(chans)
    b = Buckets()
    # conv_in
    b.conv += conv2d(lat, lat, 4, chans[0])
    h = lat
    # down path: 2 resblocks (+transformer) per level + downsample conv
    cin = chans[0]
    for i, c in enumerate(chans):
        for _ in range(2):
            b.add(resblock(h, h, cin, c))
            if tfl[i]:
                b.add(transformer(h, h, c, ctx, tfl[i]))
            cin = c
        if i < n - 1:
            b.conv += conv2d(h // 2, h // 2, c, c)
            h //= 2
    # mid: res + transformer + res at the deepest res
    b.add(resblock(h, h, chans[-1], chans[-1]))
    mid_tfl = tfl[-1] if model == 'sdxl' else 1
    if mid_tfl:
        b.add(transformer(h, h, chans[-1], ctx, mid_tfl))
    b.add(resblock(h, h, chans[-1], chans[-1]))
    # up path: 3 resblocks per level (skip concat doubles cin) + upsample
    for i in reversed(range(n)):
        c = chans[i]
        c_skip_below = chans[i + 1] if i + 1 < n else chans[-1]
        prev = c_skip_below
        for j in range(3):
            skip = c if j < 2 else (chans[i - 1] if i > 0 else chans[0])
            b.add(resblock(h, h, prev + skip, c))
            if tfl[i]:
                b.add(transformer(h, h, c, ctx, tfl[i]))
            prev = c
        if i > 0:
            h *= 2
            b.conv += conv2d(h, h, c, c)
    # conv_out
    b.conv += conv2d(lat, lat, chans[0], 4)
    return b


def vae_decode_flops(size):
    """AutoencoderKL decoder, batch 1 (SD layout: 512ch at low res,
    upsampling 8x; one mid attention at lat res)."""
    lat = size // 8
    b = Buckets()
    chans = [512, 512, 256, 128]
    b.conv += conv2d(lat, lat, 4, 512, k=1) + conv2d(lat, lat, 4, 512)
    # mid: 2 res + attn
    b.add(resblock(lat, lat, 512, 512, temb=0))
    b.add(resblock(lat, lat, 512, 512, temb=0))
    s = lat * lat
    b.proj += 4 * (2.0 * s * 512 * 512)
    b.attn += 2 * (2.0 * s * s * 512)
    h = lat
    cin = 512
    for i, c in enumerate(chans):
        for _ in range(3):
            b.add(resblock(h, h, cin, c, temb=0))
            cin = c
        if i < 3:
            h *= 2
            b.conv += conv2d(h, h, c, c)
    b.conv += conv2d(size, size, 128, 3)
    return b


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--model', default='sd15')
    ap.add_argument('--steps', type=int, default=20)
    ap.add_argument('--cfg', type=int, default=2)
    args = ap.parse_args()
    sizes = (512, 768, 1024)
    print(f'{args.model}, {args.steps} steps, CFG x{args.cfg} '
          f'(TFLOP per image)')
    hdr = f'{"size":>6} {"conv":>8} {"proj":>8} {"attn":>8} {"other":>8} ' \
          f'{"unet.tot":>9} {"vae":>7} {"total":>8} {"attn%":>6}'
    print(hdr)
    for size in sizes:
        u = unet_flops(size, args.model)
        k = args.steps * args.cfg / 1e12
        v = vae_decode_flops(size)
        tot = u.total() * k + v.total() / 1e12
        print(f'{size:>6} {u.conv*k:>8.2f} {u.proj*k:>8.2f} '
              f'{u.attn*k:>8.2f} {u.other*k:>8.2f} {u.total()*k:>9.2f} '
              f'{v.total()/1e12:>7.2f} {tot:>8.2f} '
              f'{100*u.attn*k/tot:>5.1f}%')


if __name__ == '__main__':
    main()
