"""BGV private matmul/conv through the app layer. The reference's
coefficient-packed LinearHelper serves BFV and BGV alike
(app/LinearHelper.cuh:228-337 is scheme-generic over the evaluator;
test/app/linear.cu exercises it with both schemes) — this pins the BGV
path of our scheme-generic helper, including correction-factor handling
through multiply_plain and the serialize/deserialize wire format."""

import numpy as np
import pytest

import troy_tpu as T
from troy_tpu import prng as rnd
from troy_tpu.app.linear import MatmulHelper, Conv2dHelper

N = 64


@pytest.fixture(scope="module")
def bgv():
    parms = T.EncryptionParameters(
        scheme=T.SchemeType.bgv, poly_modulus_degree=N,
        coeff_modulus=tuple(T.CoeffModulus.create(N, [40, 40, 40])),
        plain_modulus=T.PlainModulus.batching(N, 20))
    ctx = T.HeContext(parms, sec_level=T.SecurityLevel.none)
    kg = T.KeyGenerator(ctx, seed=rnd.seed_from_uint64(4242))
    enc = T.Encryptor(ctx, public_key=kg.create_public_key(),
                      secret_key=kg.secret_key)
    dec = T.Decryptor(ctx, kg.secret_key)
    ev = T.Evaluator(ctx)
    be = T.BatchEncoder(ctx)
    return ctx, enc, dec, ev, be


def test_bgv_matmul_plain_weights(bgv):
    ctx, enc, dec, ev, be = bgv
    t = int(ctx.first_context_data.plain_modulus)
    rng = np.random.default_rng(11)
    B, I, O = 3, 4, 5
    x = rng.integers(0, t, (B, I), dtype=np.uint64)
    w = rng.integers(0, t, (I, O), dtype=np.uint64)

    helper = MatmulHelper(B, I, O, N, objective=0, pack_lwe=False)
    w_enc = helper.encode_weights(be.encode_polynomial, w)
    x_ct = helper.encrypt_inputs(enc, be.encode_polynomial, x)
    y_ct = helper.matmul(ev, x_ct, w_enc)
    blob = helper.serialize_outputs(ev, ctx, y_ct)
    y_ct2 = helper.deserialize_outputs(ev, ctx, blob)
    y = helper.decrypt_outputs(be.decode_polynomial, dec, y_ct2)
    expect = (x.astype(object) @ w.astype(object)) % t
    np.testing.assert_array_equal(y.astype(object) % t, expect)


def test_bgv_conv2d(bgv):
    ctx, enc, dec, ev, be = bgv
    t = int(ctx.first_context_data.plain_modulus)
    rng = np.random.default_rng(12)
    B, H, W, KH, KW, CI, CO = 1, 4, 4, 2, 2, 2, 2
    img = rng.integers(0, t, (B, CI, H, W), dtype=np.uint64)
    ker = rng.integers(0, t, (CO, CI, KH, KW), dtype=np.uint64)

    helper = Conv2dHelper(B, H, W, KH, KW, CI, CO, N, objective=0)
    w_enc = helper.encode_weights(be.encode_polynomial, ker)
    x_ct = helper.encrypt_inputs(enc, be.encode_polynomial, img)
    y_ct = helper.conv2d(ev, x_ct, w_enc)
    y = helper.decrypt_outputs(be.decode_polynomial, dec, y_ct)

    oh, ow = H - KH + 1, W - KW + 1
    expect = np.zeros((B, CO, oh, ow), dtype=object)
    for b in range(B):
        for co in range(CO):
            for i in range(oh):
                for j in range(ow):
                    acc = 0
                    for ci in range(CI):
                        acc += int((img[b, ci, i:i + KH, j:j + KW]
                                    .astype(object) * ker[co, ci]
                                    .astype(object)).sum())
                    expect[b, co, i, j] = acc % t
    np.testing.assert_array_equal(y.astype(object) % t, expect)


def test_bgv_matmul_cipher_weights(bgv):
    ctx, enc, dec, ev, be = bgv
    t = int(ctx.first_context_data.plain_modulus)
    rng = np.random.default_rng(13)
    B, I, O = 2, 3, 4
    x = rng.integers(0, t, (B, I), dtype=np.uint64)
    w = rng.integers(0, t, (I, O), dtype=np.uint64)

    helper = MatmulHelper(B, I, O, N, objective=0, pack_lwe=False)
    w_ct = helper.encode_weights(be.encode_polynomial, w).encrypt(enc)
    x_ct = helper.encrypt_inputs(enc, be.encode_polynomial, x)
    y_ct = helper.matmul_cipher(ev, x_ct, w_ct)
    y = helper.decrypt_outputs(be.decode_polynomial, dec, y_ct)
    expect = (x.astype(object) @ w.astype(object)) % t
    np.testing.assert_array_equal(y.astype(object) % t, expect)


def test_bgv_conv2d_reverse(bgv):
    """Encrypted weights x plain inputs under BGV (conv2dReverse,
    LinearHelper.cuh:1020-1043) — pins the scheme-generic reverse path's
    NTT-form plaintext handling and correction factors."""
    ctx, enc, dec, ev, be = bgv
    t = int(ctx.first_context_data.plain_modulus)
    rng = np.random.default_rng(13)
    B, H, W, KH, KW, CI, CO = 2, 4, 4, 2, 2, 1, 2
    img = rng.integers(0, t, (B, CI, H, W), dtype=np.uint64)
    ker = rng.integers(0, t, (CO, CI, KH, KW), dtype=np.uint64)

    helper = Conv2dHelper(B, H, W, KH, KW, CI, CO, N, objective=1)
    w_ct = helper.encode_weights(be.encode_polynomial, ker) \
        .encrypt_symmetric(enc)
    x_pt = helper.encode_inputs(be.encode_polynomial, img)
    y_ct = helper.conv2d_reverse(ev, x_pt, w_ct)
    y = helper.decrypt_outputs(be.decode_polynomial, dec, y_ct)

    oh, ow = H - KH + 1, W - KW + 1
    expect = np.zeros((B, CO, oh, ow), dtype=object)
    for b in range(B):
        for co in range(CO):
            for i in range(oh):
                for j in range(ow):
                    acc = 0
                    for ci in range(CI):
                        acc += int((img[b, ci, i:i + KH, j:j + KW]
                                    .astype(object) * ker[co, ci]
                                    .astype(object)).sum())
                    expect[b, co, i, j] = acc % t
    np.testing.assert_array_equal(y.astype(object) % t, expect)
