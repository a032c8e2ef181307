import numpy as np

from hcpdiff_tpu.utils.clip_tokenizer import CLIPTokenizer
from hcpdiff_tpu.models.text_frontend import parse_attn_mult


def test_tiny_tokenizer_roundtrip():
    tk = CLIPTokenizer.tiny(words=['cat', 'dog', 'photo'])
    ids = tk.tokenize_words('a photo of cat')
    assert len(ids) > 0
    text = tk.decode(ids)
    assert 'photo' in text and 'cat' in text


def test_tokenizer_call_padding():
    tk = CLIPTokenizer.tiny(words=['cat'])
    out = tk(['cat', 'cat cat cat'])
    ids = np.asarray(out['input_ids'])
    assert ids.shape == (2, 77)
    assert ids[0, 0] == tk.bos_token_id
    assert (ids[:, -1] == tk.pad_token_id).all() or (ids[:, -1] == tk.eos_token_id).all()


def test_added_tokens_expand():
    tk = CLIPTokenizer.tiny(words=['cat'])
    ids_plain = tk.tokenize_words('a cat')
    ext = tk.add_word('my-pt', n_vectors=3)
    assert ext == [tk.vocab_size, tk.vocab_size + 1, tk.vocab_size + 2]
    ids = tk.tokenize_words('a my-pt cat')
    assert ids.count(ext[0]) == 1 and ids.count(ext[1]) == 1 and ids.count(ext[2]) == 1
    # plain text tokenization unchanged
    assert tk.tokenize_words('a cat') == ids_plain


def test_parse_attn_mult_plain():
    clean, segs = parse_attn_mult('a photo of a cat')
    assert clean == 'a photo of a cat'
    assert segs == [('a photo of a cat', 1.0)]


def test_parse_attn_mult_weights():
    clean, segs = parse_attn_mult('a {photo} of a {cat:1.5}')
    assert clean == 'a photo of a cat'
    d = {s.strip(): w for s, w in segs if s.strip()}
    assert abs(d['photo'] - 1.1) < 1e-6
    assert abs(d['cat'] - 1.5) < 1e-6


def test_parse_attn_mult_nested():
    clean, segs = parse_attn_mult('{a {b}}')
    d = {s.strip(): w for s, w in segs if s.strip()}
    assert abs(d['a'] - 1.1) < 1e-6
    assert abs(d['b'] - 1.21) < 1e-6


def test_windows_packing():
    tk = CLIPTokenizer.tiny(words=['cat'], model_max_length=9)
    win = tk.encode_windows('cat ' * 30, n_repeats=2)
    assert len(win) == 18
    assert win[0] == tk.bos_token_id and win[9] == tk.bos_token_id


def test_frontend_attention_mask():
    import numpy as np
    from hcpdiff_tpu.models.text_frontend import TextEncoderFrontend
    from helpers import tiny_world
    w = tiny_world()
    fe = w['frontend']
    ids, _ = fe.tokenize_batch(['cat', 'cat dog photo cat dog'])
    m = fe.attention_mask(ids)
    assert m.shape == (2, 77)
    assert m[0, 0] == 1  # BOS
    assert m[0].sum() < m[1].sum()  # longer prompt -> more unmasked tokens
    assert m[0, -1] == 0  # padding masked
