"""HASH / URL / IP / UUID / ENCODING functions.

Reference inventory: datastore/function_definitions.py — HASH 31
(:3059-3101,6035-6161), URL 15 (:4346-4542), IP 9 (:4561-4673),
UUID 8 (:5364-5406), ENCODING 13 (:5264-5345).

IP math is implemented as pure Column bit arithmetic on longs (no UDF) —
IPv4 fits in a long; IPv6 is string-normalized only.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from chdb_spark.functions.registry import register, register_many

# --- HASH (reference :3059-3101,6035-6161) ---

register_many(
    "HASH",
    {
        "MD5": F.md5,
        "SHA1": F.sha1,
        "SHA224": lambda c: F.sha2(c, 224),
        "SHA256": lambda c: F.sha2(c, 256),
        "SHA384": lambda c: F.sha2(c, 384),
        "SHA512": lambda c: F.sha2(c, 512),
        "xxHash64": F.xxhash64,
        "cityHash64": F.xxhash64,  # engine-specific 64-bit hash; xxhash64 is Spark's
        "sipHash64": F.xxhash64,
        "xxHash32": F.hash,  # 32-bit murmur3; same role as CH's 32-bit family
        "CRC32": F.crc32,
        "hex_md5_prefix64": lambda c: F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long"),
    },
)

# --- URL (reference :4346-4542) — parse_url covers the whole family ---

register_many(
    "URL",
    {
        "protocol": lambda c: F.lower(F.regexp_extract(c, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1)),
        "domain": lambda c: F.parse_url(c, F.lit("HOST")),
        "topLevelDomain": lambda c: F.regexp_extract(F.parse_url(c, F.lit("HOST")), r"\.([^.]+)$", 1),
        "firstSignificantSubdomain": lambda c: F.regexp_extract(
            F.parse_url(c, F.lit("HOST")), r"(?:^|\.)([^.]+)\.[^.]+$", 1
        ),
        "path": lambda c: F.parse_url(c, F.lit("PATH")),
        "pathFull": lambda c: F.concat_ws(
            "?", F.parse_url(c, F.lit("PATH")), F.parse_url(c, F.lit("QUERY"))
        ),
        "queryString": lambda c: F.parse_url(c, F.lit("QUERY")),
        "fragment": lambda c: F.parse_url(c, F.lit("REF")),
        "port": lambda c: F.regexp_extract(c, r"://[^/]*?:(\d+)", 1).cast("int"),
        "extractURLParameter": lambda c, p: F.parse_url(c, F.lit("QUERY"), F.lit(p)),
        "cutQueryString": lambda c: F.regexp_replace(c, r"\?.*$", ""),
        "encodeURLComponent": F.url_encode,
        "decodeURLComponent": F.url_decode,
        "netloc": lambda c: F.regexp_extract(c, r"^[a-zA-Z0-9+.-]+://([^/?#]*)", 1),
    },
)

# --- IP (reference :4561-4673) — bit math on longs, no UDF ---


@register("IPv4StringToNum", "IP")
def ipv4_string_to_num(c) -> Column:
    o = [F.split(c, r"\.")[i].cast("long") for i in range(4)]
    return o[0] * 16777216 + o[1] * 65536 + o[2] * 256 + o[3]


@register("IPv4NumToString", "IP")
def ipv4_num_to_string(c) -> Column:
    c = c.cast("long")
    return F.concat_ws(
        ".",
        ((c / 16777216).cast("long") % 256).cast("string"),
        ((c / 65536).cast("long") % 256).cast("string"),
        ((c / 256).cast("long") % 256).cast("string"),
        (c % 256).cast("string"),
    )


@register("isIPv4String", "IP")
def is_ipv4_string(c) -> Column:
    octet = r"(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)"
    return c.rlike(rf"^{octet}\.{octet}\.{octet}\.{octet}$")


@register("isIPv6String", "IP")
def is_ipv6_string(c) -> Column:
    return c.rlike(r"^[0-9a-fA-F:]+$") & c.contains(":")


@register("IPv4CIDRToRange", "IP")
def ipv4_cidr_to_range(c, prefix: int) -> Column:
    """(lo, hi) struct of the CIDR block — pure bit math."""
    base = ipv4_string_to_num(c)
    block = F.lit(2 ** (32 - prefix))
    lo = (base / block).cast("long") * block
    return F.struct(
        ipv4_num_to_string(lo).alias("lo"), ipv4_num_to_string(lo + block - 1).alias("hi")
    )


@register("toIPv4", "IP")
def to_ipv4(c) -> Column:
    return c  # canonical string form retained (SURVEY §1.3: IPv4 → StringType)


# --- UUID (reference :5364-5406) ---

register_many(
    "UUID",
    {
        "generateUUIDv4": lambda: F.expr("uuid()"),
        "toUUID": lambda c: F.lower(c.cast("string")),
        "UUIDStringToNum": lambda c: F.regexp_replace(c, "-", ""),
        "UUIDNumToString": lambda c: F.concat_ws(
            "-",
            F.substring(c, 1, 8),
            F.substring(c, 9, 4),
            F.substring(c, 13, 4),
            F.substring(c, 17, 4),
            F.substring(c, 21, 12),
        ),
    },
)

# --- ENCODING (reference :5264-5345) ---

register_many(
    "ENCODING",
    {
        "hex": F.hex,
        "unhex": F.unhex,
        "base64Encode": F.base64,
        "base64Decode": lambda c: F.unbase64(c).cast("string"),
        "bin": F.bin,
        "bitCount": F.bit_count,
        "conv": F.conv,
        "char": F.char if hasattr(F, "char") else (lambda c: F.expr(f"char({c})")),
        "bitAnd": lambda a, b: a.bitwiseAND(b),
        "bitOr": lambda a, b: a.bitwiseOR(b),
        "bitXor": lambda a, b: a.bitwiseXOR(b),
        "bitNot": lambda a: _bitnot(a),
        "bitShiftLeft": F.shiftleft,
        "bitShiftRight": F.shiftright,
    },
)


def _bitnot(a) -> Column:
    return -(a.cast("long")) - 1
