"""CKKS private matmul/conv through the app layer — the reference's
LinearHelperCKKS scenarios (reference: app/LinearHelperCKKS.cuh:104,362,
test/app/linear_ckks.cu) on the scheme-generic helper."""

import numpy as np
import pytest

import troy_tpu as T
from troy_tpu import prng as rnd
from troy_tpu.app.linear import MatmulHelper, Conv2dHelper

N = 256
SCALE = float(1 << 30)


@pytest.fixture(scope="module")
def ckks():
    parms = T.EncryptionParameters(
        scheme=T.SchemeType.ckks, poly_modulus_degree=N,
        coeff_modulus=tuple(T.CoeffModulus.create(N, [40, 40, 40])))
    ctx = T.HeContext(parms, sec_level=T.SecurityLevel.none)
    kg = T.KeyGenerator(ctx, seed=rnd.seed_from_uint64(99))
    enc = T.Encryptor(ctx, secret_key=kg.secret_key)
    dec = T.Decryptor(ctx, kg.secret_key)
    ev = T.Evaluator(ctx)
    encd = T.CKKSEncoder(ctx)
    return ctx, enc, dec, ev, encd


def test_ckks_matmul(ckks):
    ctx, enc, dec, ev, encd = ckks
    bs, ind, outd = 2, 3, 4
    rng = np.random.default_rng(5)
    x = rng.uniform(-1, 1, (bs, ind))
    w = rng.uniform(-1, 1, (ind, outd))

    ep = lambda v: encd.encode_polynomial(v, SCALE)
    dp = encd.decode_polynomial
    helper = MatmulHelper(bs, ind, outd, N, objective=0, pack_lwe=False)
    w_enc = helper.encode_weights(ep, w)
    x_ct = helper.encrypt_inputs(enc, ep, x)
    y_ct = helper.matmul(ev, x_ct, w_enc)
    got = helper.decrypt_outputs(dp, dec, y_ct)
    assert np.allclose(got, x @ w, atol=1e-3)


def test_ckks_conv2d_basic(ckks):
    ctx, enc, dec, ev, encd = ckks
    B, H, W_, KH, KW, CI, CO = 1, 4, 4, 3, 3, 2, 2
    rng = np.random.default_rng(8)
    img = rng.uniform(-1, 1, (B, CI, H, W_))
    ker = rng.uniform(-1, 1, (CO, CI, KH, KW))

    ep = lambda v: encd.encode_polynomial(v, SCALE)
    dp = encd.decode_polynomial
    helper = Conv2dHelper(B, H, W_, KH, KW, CI, CO, N, objective=0)
    w_enc = helper.encode_weights(ep, ker)
    x_ct = helper.encrypt_inputs(enc, ep, img)
    y_ct = helper.conv2d(ev, x_ct, w_enc)
    got = helper.decrypt_outputs(dp, dec, y_ct)

    # plain valid conv reference
    YH, YW = H - KH + 1, W_ - KW + 1
    expect = np.zeros((B, CO, YH, YW))
    for b in range(B):
        for co in range(CO):
            for i in range(YH):
                for j in range(YW):
                    expect[b, co, i, j] = np.sum(
                        img[b, :, i:i + KH, j:j + KW] * ker[co])
    assert np.allclose(got, expect, atol=1e-3)


def test_ckks_conv2d(ckks):
    """CKKS conv2d through the scheme-generic Conv2dHelper (reference
    LinearHelperCKKS.cuh Conv2dHelper / test/app/linear_ckks.cu)."""
    ctx, enc, dec, ev, encd = ckks
    B, H, W, KH, KW, CI, CO = 1, 5, 5, 2, 2, 2, 2
    rng = np.random.default_rng(17)
    x = rng.uniform(-1, 1, (B, CI, H, W))
    w = rng.uniform(-1, 1, (CO, CI, KH, KW))

    ep = lambda v: encd.encode_polynomial(v, SCALE)
    dp = encd.decode_polynomial
    helper = Conv2dHelper(B, H, W, KH, KW, CI, CO, N, objective=0)
    w_enc = helper.encode_weights(ep, w)
    x_ct = helper.encode_inputs(ep, x).encrypt_symmetric(enc)
    y_ct = helper.conv2d(ev, x_ct, w_enc)
    blob = helper.serialize_outputs(ev, ctx, y_ct)
    y2 = helper.deserialize_outputs(ev, ctx, blob)
    y = helper.decrypt_outputs(dp, dec, y2)
    oh, ow = H - KH + 1, W - KW + 1
    expect = np.zeros((B, CO, oh, ow))
    for b in range(B):
        for co in range(CO):
            for i in range(oh):
                for j in range(ow):
                    for ci in range(CI):
                        expect[b, co, i, j] += (
                            x[b, ci, i:i + KH, j:j + KW] * w[co, ci]).sum()
    np.testing.assert_allclose(y.astype(np.float64), expect, atol=1e-3)


def test_ckks_conv2d_reverse(ckks):
    """Encrypted weights x plain inputs under CKKS (conv2dReverse,
    LinearHelper.cuh:1020-1043 / the CKKS twin LinearHelperCKKS.cuh) —
    pins the reverse path's NTT-form plaintext level/scale handling."""
    ctx, enc, dec, ev, encd = ckks
    B, H, W_, KH, KW, CI, CO = 1, 4, 4, 2, 2, 2, 2
    rng = np.random.default_rng(21)
    img = rng.uniform(-1, 1, (B, CI, H, W_))
    ker = rng.uniform(-1, 1, (CO, CI, KH, KW))

    ep = lambda v: encd.encode_polynomial(v, SCALE)
    dp = encd.decode_polynomial
    helper = Conv2dHelper(B, H, W_, KH, KW, CI, CO, N, objective=1)
    w_ct = helper.encode_weights(ep, ker).encrypt_symmetric(enc)
    x_pt = helper.encode_inputs(ep, img)
    y_ct = helper.conv2d_reverse(ev, x_pt, w_ct)
    got = helper.decrypt_outputs(dp, dec, y_ct)

    YH, YW = H - KH + 1, W_ - KW + 1
    expect = np.zeros((B, CO, YH, YW))
    for b in range(B):
        for co in range(CO):
            for i in range(YH):
                for j in range(YW):
                    expect[b, co, i, j] = np.sum(
                        img[b, :, i:i + KH, j:j + KW] * ker[co])
    assert np.allclose(got, expect, atol=1e-3)
