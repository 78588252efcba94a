"""Protocol-handshake parity tests (client.go:324-369): authentication
command golden values (cross-checked against Spark's own sha1/hex
expressions), command formatting, and the three independent timeouts
(the reference's option-setter bug, deliberately not reproduced)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from maxscale_cdc_spark.sources.cdc_source import (
    TransportOptions,
    format_authentication_command,
    format_register_command,
    format_request_data_command,
)


def test_auth_command_golden():
    # hex("user:") = 757365723a; sha1("") digest hex = da39a3ee...0709
    got = format_authentication_command("user", "")
    assert got == b"757365723a" + b"da39a3ee5e6b4b0d3255bfef95601890afd80709"


def test_auth_command_matches_spark_exprs(spark):
    """Spark `hex(concat(user, ':', unhex(sha1(pw))))` reproduces the
    transport's auth bytes — the engine can verify credentials server-
    side with built-ins only."""
    row = (
        spark.range(1)
        .select(
            F.lower(
                F.hex(
                    F.concat(
                        F.lit("maxuser").cast("binary"),
                        F.lit(":").cast("binary"),
                        F.unhex(F.sha1(F.lit("maxpwd").cast("binary"))),
                    )
                )
            ).alias("auth")
        )
        .collect()[0]
    )
    assert row["auth"] == format_authentication_command("maxuser", "maxpwd").decode()


def test_register_and_request_commands():
    assert format_register_command("u-1") == b"REGISTER UUID=u-1, TYPE=JSON"
    assert (
        format_request_data_command("test", "tests") == b"REQUEST-DATA test.tests"
    )
    assert (
        format_request_data_command("test", "tests", version="2")
        == b"REQUEST-DATA test.tests.2"
    )
    assert (
        format_request_data_command("test", "tests", gtid="0-3000-8")
        == b"REQUEST-DATA test.tests 0-3000-8"
    )
    with pytest.raises(ValueError):
        format_request_data_command("", "tests")


def test_timeouts_are_independent():
    """WithDialTimeout/WithWriteTimeout must NOT alias readTimeout
    (the reference bug at client.go:49-53, 63-67)."""
    o = TransportOptions(dial_timeout_s=1, read_timeout_s=2, write_timeout_s=3)
    assert (o.dial_timeout_s, o.read_timeout_s, o.write_timeout_s) == (1.0, 2.0, 3.0)
    d = TransportOptions()
    assert (
        d.dial_timeout_s == d.read_timeout_s == d.write_timeout_s == 5.0
    )  # defaults, client.go:31-35
