"""Driver-side HTML reporting (reference K4).

Re-expresses the Raptor e-mail report (wheel Raptor/Raptor.py:142-263):
small result frames are collected (bounded by ``limit``), rendered as HTML
tables, and stitched into one summary document. Differences from the
reference: no hardcoded SMTP host/credentials (Raptor.py:144-145 embeds
them) — delivery is a pluggable callable; rendering never pulls more than
``limit`` rows per section to the driver.
"""

from __future__ import annotations

import html
from collections.abc import Callable

from pyspark.sql import DataFrame

#: Reference caps: 15-row tables, 5-row extras samples (Raptor.py:207,664,673).
DEFAULT_ROW_LIMIT = 15

Sender = Callable[[str, str], None]  # (subject, html_body) -> None


def frame_to_html(df: DataFrame, limit: int = DEFAULT_ROW_LIMIT) -> str:
    """Render ≤ limit rows as an HTML table (driver-side, bounded)."""
    rows = df.limit(limit).collect()
    cols = df.columns
    head = "".join(f"<th>{html.escape(c)}</th>" for c in cols)
    body = "".join(
        "<tr>"
        + "".join(f"<td>{html.escape(str(r[c]))}</td>" for c in cols)
        + "</tr>"
        for r in rows
    )
    return (
        f"<table border='1' cellspacing='0' cellpadding='4'>"
        f"<thead><tr>{head}</tr></thead><tbody>{body}</tbody></table>"
    )


def reconcile_report_html(
    result, title: str = "Reconciliation report", column_summary=None
) -> str:
    """Full report for a quality.reconcile result: summary, per-column
    mismatch stats, sample mismatching cells, sample extras each side.

    Pass ``column_summary`` when the caller already built it (orchestrate
    does) so the cells rollup isn't planned and executed twice."""
    from asritha_metamorphetl_spark.quality.reconcile import column_mismatch_summary

    if column_summary is None:
        column_summary = column_mismatch_summary(result)
    sections = [
        ("Summary", frame_to_html(result.summary)),
        ("Column mismatch summary", frame_to_html(column_summary)),
        ("Sample cell mismatches", frame_to_html(result.column_mismatches)),
        ("Rows only in source", frame_to_html(result.source_only, limit=5)),
        ("Rows only in target", frame_to_html(result.target_only, limit=5)),
    ]
    body = "".join(
        f"<h3>{html.escape(name)}</h3>{table}" for name, table in sections
    )
    return f"<html><body><h2>{html.escape(title)}</h2>{body}</body></html>"


def send_report(
    result,
    sender: Sender,
    title: str = "Reconciliation report",
) -> str:
    """Render + hand off to the injected sender (SMTP, webhook, file, …).
    Returns the HTML so callers can persist it as well."""
    doc = reconcile_report_html(result, title=title)
    sender(title, doc)
    return doc


def smtp_sender(
    host: str | None = None,
    port: int | None = None,
    sender: str | None = None,
    recipients: list[str] | str | None = None,
    username: str | None = None,
    password: str | None = None,
    use_ssl: bool | None = None,
) -> Sender:
    """Build an SMTP ``Sender`` — the transport the reference hardwires
    (wheel Raptor/Raptor.py:142-263, SMTP-SSL with embedded host and
    credentials at :144-157), made config/env-driven with NO credential
    defaults.

    Every parameter falls back to a ``METAMORPH_SMTP_*`` environment
    variable (HOST, PORT, SENDER, RECIPIENTS comma-separated, USERNAME,
    PASSWORD, SSL); host/sender/recipients are required at CALL time so a
    misconfigured pipeline fails when building the sender, not mid-send.
    Auth is attempted only when a username is configured; ``use_ssl``
    picks SMTP_SSL (the reference's mode) vs plain SMTP for local debug
    servers."""
    import os
    import smtplib
    from email.mime.multipart import MIMEMultipart
    from email.mime.text import MIMEText

    env = os.environ.get
    host = host or env("METAMORPH_SMTP_HOST")
    port = port if port is not None else int(env("METAMORPH_SMTP_PORT", "465"))
    sender_addr = sender or env("METAMORPH_SMTP_SENDER")
    if isinstance(recipients, str):
        recipients = [recipients]
    recipients = recipients or [
        r.strip()
        for r in env("METAMORPH_SMTP_RECIPIENTS", "").split(",")
        if r.strip()
    ]
    username = username or env("METAMORPH_SMTP_USERNAME")
    password = password or env("METAMORPH_SMTP_PASSWORD")
    if use_ssl is None:
        use_ssl = env("METAMORPH_SMTP_SSL", "true").lower() == "true"
    if not host or not sender_addr or not recipients:
        raise ValueError(
            "smtp_sender needs host, sender, and recipients "
            "(args or METAMORPH_SMTP_{HOST,SENDER,RECIPIENTS})"
        )

    def send(subject: str, html_body: str) -> None:
        msg = MIMEMultipart("alternative")
        msg["Subject"] = subject
        msg["From"] = sender_addr
        msg["To"] = ", ".join(recipients)
        msg.attach(MIMEText(html_body, "html"))
        cls = smtplib.SMTP_SSL if use_ssl else smtplib.SMTP
        with cls(host, port) as server:
            if username and password:
                server.login(username, password)
            server.sendmail(sender_addr, recipients, msg.as_string())

    return send
