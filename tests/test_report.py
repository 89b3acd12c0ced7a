"""HTML report rendering (reference K4) — bounded, injectable delivery."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_reconcile_report_html(spark):
    from asritha_metamorphetl_spark.quality import reconcile
    from asritha_metamorphetl_spark.report import send_report

    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(40)], "id int, v string"
    )
    target = base.withColumn(
        "v", F.when(F.col("id") == 7, "CHANGED").otherwise(F.col("v"))
    ).filter("id != 11")
    r = reconcile(base, target, ["id"])

    sent = {}

    def fake_sender(subject: str, body: str) -> None:
        sent["subject"] = subject
        sent["body"] = body

    html_doc = send_report(r, fake_sender, title="orders recon")
    assert sent["subject"] == "orders recon"
    assert sent["body"] == html_doc
    assert "CHANGED" in html_doc  # the mismatching cell is shown
    assert "Rows only in source" in html_doc
    # bounded rendering: never more than the 15-row cap per table
    assert html_doc.count("<tr>") < 6 * 20
    r.unpersist()


class _DebugSMTPServer:
    """Minimal threaded SMTP server: speaks just enough of RFC 5321 to
    accept one message and record it (no external deps; smtpd was
    removed from the stdlib and aiosmtpd isn't in this container)."""

    def __init__(self):
        import socket
        import threading

        self.messages = []
        self._sock = socket.socket()
        self._sock.bind(("127.0.0.1", 0))
        self._sock.listen(1)
        self.port = self._sock.getsockname()[1]
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    def _serve(self):
        conn, _ = self._sock.accept()
        f = conn.makefile("rb")
        conn.sendall(b"220 debug ESMTP\r\n")
        data, in_data = [], False
        while True:
            line = f.readline()
            if not line:
                break
            if in_data:
                if line.rstrip(b"\r\n") == b".":
                    self.messages.append(b"".join(data).decode())
                    conn.sendall(b"250 OK\r\n")
                    in_data = False
                else:
                    data.append(line)
                continue
            cmd = line.split()[0].upper() if line.split() else b""
            if cmd in (b"EHLO", b"HELO"):
                conn.sendall(b"250 debug\r\n")
            elif cmd == b"DATA":
                conn.sendall(b"354 go\r\n")
                in_data = True
            elif cmd == b"QUIT":
                conn.sendall(b"221 bye\r\n")
                break
            else:
                conn.sendall(b"250 OK\r\n")
        conn.close()
        self._sock.close()


def test_smtp_sender_delivers_via_local_debug_server():
    from asritha_metamorphetl_spark.report import smtp_sender

    server = _DebugSMTPServer()
    send = smtp_sender(
        host="127.0.0.1",
        port=server.port,
        sender="reports@example.test",
        recipients=["dq@example.test"],
        use_ssl=False,
    )
    send("Reconcile run 42", "<html><body><b>ok</b></body></html>")
    server._thread.join(timeout=5)
    assert len(server.messages) == 1
    msg = server.messages[0]
    assert "Subject: Reconcile run 42" in msg
    assert "From: reports@example.test" in msg
    assert "To: dq@example.test" in msg
    assert "text/html" in msg


def test_smtp_sender_requires_host_and_recipients(monkeypatch):
    import pytest as _pytest

    from asritha_metamorphetl_spark.report import smtp_sender

    for var in ("METAMORPH_SMTP_HOST", "METAMORPH_SMTP_SENDER",
                "METAMORPH_SMTP_RECIPIENTS"):
        monkeypatch.delenv(var, raising=False)
    with _pytest.raises(ValueError):
        smtp_sender(use_ssl=False)


def test_smtp_sender_env_config(monkeypatch):
    from asritha_metamorphetl_spark.report import smtp_sender

    server = _DebugSMTPServer()
    monkeypatch.setenv("METAMORPH_SMTP_HOST", "127.0.0.1")
    monkeypatch.setenv("METAMORPH_SMTP_PORT", str(server.port))
    monkeypatch.setenv("METAMORPH_SMTP_SENDER", "env@example.test")
    monkeypatch.setenv("METAMORPH_SMTP_RECIPIENTS", "a@example.test, b@example.test")
    monkeypatch.setenv("METAMORPH_SMTP_SSL", "false")
    send = smtp_sender()
    send("env-driven", "<p>hi</p>")
    server._thread.join(timeout=5)
    assert len(server.messages) == 1
    assert "To: a@example.test, b@example.test" in server.messages[0]
