import os

import numpy as np
import pytest


def test_pt_creator_tiny(tmp_path):
    from hcpdiff_tpu.tools.create_embedding import PTCreator
    from hcpdiff_tpu.ckpt.formats import load_webui_embedding
    c = PTCreator('tiny', root=str(tmp_path))
    p = c.creat_word_pt('my-word', 3, init_text='a photo of cat')
    name, vecs = load_webui_embedding(p)
    assert name == 'my-word'
    assert vecs.shape[0] == 3 and vecs.shape[1] == c.dim
    # random slots
    p2 = c.creat_word_pt('rand-word', 4, init_text='*[0.02,4]')
    _, v2 = load_webui_embedding(p2)
    assert v2.shape == (4, c.dim)
    assert abs(float(np.std(v2)) - 0.02) < 0.01
    with pytest.raises(FileExistsError):
        c.creat_word_pt('my-word', 3)


def test_gen_from_ptlist_prompt_loading(tmp_path):
    from hcpdiff_tpu.tools.gen_from_ptlist import load_prompts
    txt = tmp_path / 'p.txt'
    txt.write_text('a cat\na dog\n\n')
    assert load_prompts(str(txt)) == ['a cat', 'a dog']
    csv = tmp_path / 'p.csv'
    csv.write_text('a bird\na fish\n')
    assert load_prompts(str(csv)) == ['a bird', 'a fish']


def test_caption_txt2json(tmp_path):
    import json
    from hcpdiff_tpu.tools.convert_caption_txt2json import convert
    (tmp_path / 'a.txt').write_text('caption a')
    (tmp_path / 'b.txt').write_text('caption b')
    out = convert(str(tmp_path))
    caps = json.load(open(out))
    assert caps == {'a': 'caption a', 'b': 'caption b'}


def test_embedding_convert_roundtrip(tmp_path):
    from hcpdiff_tpu.ckpt.formats import save_webui_embedding
    from hcpdiff_tpu.tools.embedding_convert import convert
    vecs = np.random.default_rng(0).normal(size=(2, 768 + 1280)).astype(np.float32)
    src = str(tmp_path / 'xl.pt')
    save_webui_embedding(src, vecs, 'xl')
    dst = str(tmp_path / 'xl_webui.pt')
    convert(src, dst, sdxl=True, to_webui=True)
    import torch
    obj = torch.load(dst, map_location='cpu', weights_only=False)
    assert obj['clip_l'].shape == (2, 768)
    assert obj['clip_g'].shape == (2, 1280)
    back = str(tmp_path / 'xl_back.pt')
    convert(dst, back, sdxl=True)
    from hcpdiff_tpu.ckpt.formats import load_webui_embedding
    _, v = load_webui_embedding(back)
    np.testing.assert_allclose(v, vecs, atol=1e-6)
