"""Range coder round-trip tests (encoder vs reference decoder).

Mirrors rav1e's ec.rs inline tests: writer round-trip properties across
randomized symbol streams, with and without CDF adaptation.
"""

import random

from rav1e_tpu.entropy.ec import ECDecoder, ECEncoder


def make_cdf(probs):
    """Build an inverse CDF (n+1 entries) from relative weights."""
    total = sum(probs)
    acc = 0
    icdf = []
    for p in probs[:-1]:
        acc += p
        icdf.append(32768 - int(32768 * acc / total))
    icdf.append(0)
    icdf.append(0)  # counter
    return icdf


def test_roundtrip_static_symbols():
    rng = random.Random(1)
    cdf = make_cdf([5, 3, 2, 1])
    syms = [rng.randrange(4) for _ in range(2000)]
    enc = ECEncoder()
    c1 = list(cdf)
    for s in syms:
        enc.encode_symbol(s, c1, adapt=False)
    data = enc.done()
    dec = ECDecoder(data)
    c2 = list(cdf)
    for s in syms:
        assert dec.decode_symbol(c2, adapt=False) == s


def test_roundtrip_adaptive_symbols():
    rng = random.Random(2)
    for nsym in (2, 3, 4, 8, 13, 16):
        cdf = make_cdf([1] * nsym)
        syms = [min(int(abs(rng.gauss(0, 2))), nsym - 1) for _ in range(3000)]
        enc = ECEncoder()
        c1 = list(cdf)
        for s in syms:
            enc.encode_symbol(s, c1)
        data = enc.done()
        dec = ECDecoder(data)
        c2 = list(cdf)
        for s in syms:
            assert dec.decode_symbol(c2) == s
        assert c1 == c2  # both sides adapted identically


def test_roundtrip_mixed_bools_literals():
    rng = random.Random(3)
    ops = []
    for _ in range(5000):
        k = rng.randrange(3)
        if k == 0:
            ops.append(("sym", rng.randrange(5)))
        elif k == 1:
            ops.append(("lit", rng.randrange(256), 8))
        else:
            ops.append(("bool", rng.randrange(2), rng.randrange(1000, 32000)))
    cdf = make_cdf([1, 2, 3, 4, 5])
    enc = ECEncoder()
    c1 = list(cdf)
    for op in ops:
        if op[0] == "sym":
            enc.encode_symbol(op[1], c1)
        elif op[0] == "lit":
            enc.encode_literal(op[1], op[2])
        else:
            enc.encode_bool(op[1], op[2])
    data = enc.done()
    dec = ECDecoder(data)
    c2 = list(cdf)
    for op in ops:
        if op[0] == "sym":
            assert dec.decode_symbol(c2) == op[1]
        elif op[0] == "lit":
            assert dec.decode_literal(op[2]) == op[1]
        else:
            assert dec.decode_bool(op[2]) == op[1]


def test_adaptation_moves_toward_symbol():
    from rav1e_tpu.entropy.ec import update_cdf

    # icdf[0] = P(sym > 0): observing symbol 1 must raise it
    cdf = make_cdf([1, 1])
    before = cdf[0]
    update_cdf(cdf, 1)
    assert cdf[0] > before
    cdf2 = make_cdf([1, 1])
    update_cdf(cdf2, 0)
    assert cdf2[0] < before


def test_short_streams():
    for n in range(1, 20):
        cdf = make_cdf([1, 1])
        enc = ECEncoder()
        c1 = list(cdf)
        for i in range(n):
            enc.encode_symbol(i & 1, c1)
        data = enc.done()
        dec = ECDecoder(data)
        c2 = list(cdf)
        for i in range(n):
            assert dec.decode_symbol(c2) == (i & 1)
