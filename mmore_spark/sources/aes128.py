"""Pure-stdlib AES-128 decryption (FIPS-197) — just enough cipher for
PDF /AESV2 stream decryption (CBC, IV prepended, PKCS#7 padding).  The
container ships no crypto library; AES-128's inverse cipher is ~100
lines of table arithmetic, verified against the FIPS-197 appendix
vector in tests.  Encryption is deliberately absent — the engine only
ever READS protected documents."""

from __future__ import annotations

_SBOX = bytes.fromhex(
    "637c777bf26b6fc53001672bfed7ab76ca82c97dfa5947f0add4a2af9ca472c0"
    "b7fd9326363ff7cc34a5e5f171d8311504c723c31896059a071280e2eb27b275"
    "09832c1a1b6e5aa0523bd6b329e32f8453d100ed20fcb15b6acbbe394a4c58cf"
    "d0efaafb434d338545f9027f503c9fa851a3408f929d38f5bcb6da2110fff3d2"
    "cd0c13ec5f974417c4a77e3d645d197360814fdc222a908846eeb814de5e0bdb"
    "e0323a0a4906245cc2d3ac629195e479e7c8376d8dd54ea96c56f4ea657aae08"
    "ba78252e1ca6b4c6e8dd741f4bbd8b8a703eb5664803f60e613557b986c11d9e"
    "e1f8981169d98e949b1e87e9ce5528df8ca1890dbfe6426841992d0fb054bb16")
_INV_SBOX = bytes(256)
_inv = bytearray(256)
for _i, _v in enumerate(_SBOX):
    _inv[_v] = _i
_INV_SBOX = bytes(_inv)
_RCON = (0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36)


def _xtime(a: int) -> int:
    a <<= 1
    return (a ^ 0x1B) & 0xFF if a & 0x100 else a


def _mul(a: int, b: int) -> int:
    out = 0
    while b:
        if b & 1:
            out ^= a
        a = _xtime(a)
        b >>= 1
    return out


def _expand_key(key: bytes) -> list[bytes]:
    words = [key[i:i + 4] for i in range(0, 16, 4)]
    for i in range(4, 44):
        tmp = words[i - 1]
        if i % 4 == 0:
            tmp = bytes(_SBOX[b] for b in tmp[1:] + tmp[:1])
            tmp = bytes([tmp[0] ^ _RCON[i // 4 - 1], tmp[1], tmp[2], tmp[3]])
        words.append(bytes(x ^ y for x, y in zip(words[i - 4], tmp)))
    return [b"".join(words[4 * r:4 * r + 4]) for r in range(11)]


def _inv_mix_columns(st: bytearray) -> None:
    for c in range(4):
        a = st[4 * c:4 * c + 4]
        st[4 * c + 0] = _mul(a[0], 14) ^ _mul(a[1], 11) ^ _mul(a[2], 13) ^ _mul(a[3], 9)
        st[4 * c + 1] = _mul(a[0], 9) ^ _mul(a[1], 14) ^ _mul(a[2], 11) ^ _mul(a[3], 13)
        st[4 * c + 2] = _mul(a[0], 13) ^ _mul(a[1], 9) ^ _mul(a[2], 14) ^ _mul(a[3], 11)
        st[4 * c + 3] = _mul(a[0], 11) ^ _mul(a[1], 13) ^ _mul(a[2], 9) ^ _mul(a[3], 14)


def _inv_shift_rows(st: bytearray) -> None:
    for r in range(1, 4):
        row = [st[r + 4 * c] for c in range(4)]
        row = row[-r:] + row[:-r]
        for c in range(4):
            st[r + 4 * c] = row[c]


def decrypt_block(key: bytes, block: bytes) -> bytes:
    """AES-128 inverse cipher on one 16-byte block."""
    rk = _expand_key(key)
    st = bytearray(x ^ y for x, y in zip(block, rk[10]))
    for rnd in range(9, 0, -1):
        _inv_shift_rows(st)
        for i in range(16):
            st[i] = _INV_SBOX[st[i]]
        st = bytearray(x ^ y for x, y in zip(st, rk[rnd]))
        _inv_mix_columns(st)
    _inv_shift_rows(st)
    for i in range(16):
        st[i] = _INV_SBOX[st[i]]
    return bytes(x ^ y for x, y in zip(st, rk[0]))


def cbc_decrypt(key: bytes, data: bytes) -> bytes:
    """PDF /AESV2 stream layout: 16-byte IV + CBC ciphertext, PKCS#7
    padded.  Returns the plaintext with padding stripped."""
    if len(data) < 32 or len(data) % 16:
        raise ValueError("aes-cbc: truncated or misaligned ciphertext")
    iv, body = data[:16], data[16:]
    out = bytearray()
    prev = iv
    for i in range(0, len(body), 16):
        blk = body[i:i + 16]
        out += bytes(x ^ y for x, y in zip(decrypt_block(key, blk), prev))
        prev = blk
    pad = out[-1]
    if not 1 <= pad <= 16:
        raise ValueError("aes-cbc: bad padding")
    return bytes(out[:-pad])
