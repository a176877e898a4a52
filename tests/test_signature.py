"""Signature tests.

Mirrors the reference's ``tests/signature.rs`` (valid accepted, tampered
rejected) plus the expiry/missing behaviours its integration tests cover
(``tests/integration.rs:71-127``).
"""

import pytest

from imagekit_tpu.signature import (
    ExpiredSignature,
    InvalidSignature,
    MissingSignature,
    canonical_string,
    error_to_http,
    sign,
    verify_signature,
)

SECRET = "test-secret"


def test_valid_signature_accepted():
    params = {"url": "https://example.com/a.jpg", "w": "100"}
    sig = sign(params, SECRET)
    verify_signature(params, sig, SECRET)  # must not raise


def test_tampered_params_rejected():
    params = {"url": "https://example.com/a.jpg", "w": "100"}
    sig = sign(params, SECRET)
    tampered = dict(params, w="999")
    with pytest.raises(InvalidSignature):
        verify_signature(tampered, sig, SECRET)


def test_wrong_secret_rejected():
    params = {"url": "https://example.com/a.jpg"}
    sig = sign(params, SECRET)
    with pytest.raises(InvalidSignature):
        verify_signature(params, sig, "other-secret")


def test_empty_sig_is_missing():
    with pytest.raises(MissingSignature):
        verify_signature({"url": "x"}, "", SECRET)


def test_expired_timestamp():
    params = {"url": "x", "t": "100"}
    sig = sign(params, SECRET)
    with pytest.raises(ExpiredSignature):
        verify_signature(params, sig, SECRET, now=200)


def test_t_equal_now_still_valid():
    # strict < comparison (src/signature.rs:70-77; SURVEY.md §2.4.5)
    params = {"url": "x", "t": "200"}
    sig = sign(params, SECRET)
    verify_signature(params, sig, SECRET, now=200)


def test_unparseable_t_ignored():
    params = {"url": "x", "t": "not-a-number"}
    sig = sign(params, SECRET)
    verify_signature(params, sig, SECRET, now=10**12)


def test_expiry_checked_before_signature():
    # reference checks expiry before computing the HMAC (src/signature.rs:69-77)
    params = {"url": "x", "t": "100"}
    with pytest.raises(ExpiredSignature):
        verify_signature(params, "totally-wrong-sig", SECRET, now=200)


def test_canonical_sorted_and_excludes_sig():
    params = {"w": "1", "url": "u", "sig": "zzz", "f": "webp"}
    assert canonical_string(params) == "f=webp&url=u&w=1"


def test_canonical_order_independence():
    a = {"url": "u", "w": "10", "h": "20"}
    b = {"h": "20", "w": "10", "url": "u"}
    assert sign(a, SECRET) == sign(b, SECRET)


def test_status_mapping():
    # Expired -> 410, others -> 401 (src/lib.rs:120-127)
    assert error_to_http(ExpiredSignature())[0] == 410
    assert error_to_http(InvalidSignature())[0] == 401
    assert error_to_http(MissingSignature())[0] == 401


def test_known_vector():
    """Pin the exact algorithm: HMAC-SHA256 over 'k=v&k=v' sorted, hex."""
    import hashlib
    import hmac as hmac_mod

    params = {"url": "https://e.com/i.jpg", "w": "400", "f": "webp"}
    canonical = "f=webp&url=https://e.com/i.jpg&w=400"
    expected = hmac_mod.new(
        SECRET.encode(), canonical.encode(), hashlib.sha256
    ).hexdigest()
    assert sign(params, SECRET) == expected
