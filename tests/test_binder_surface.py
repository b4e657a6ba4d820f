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
