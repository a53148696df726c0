"""Email sink — reference S11.

The reference assembles a plain-text report plus the whole events CSV
as an attachment and sends it through localhost SMTP
(/root/reference/lib/maillogsentinel/report.py:221-453; the send itself
at report.py:444-447). Message assembly is pure driver-side work over
already-collected aggregates, so this module is deliberately not a
Spark operator: build the ``EmailMessage`` from the rendered report and
the CSV bytes, and inject the transport (tests never touch a network,
exactly like the reference's own tests mock smtplib).
"""

from __future__ import annotations

import smtplib
from email.message import EmailMessage
from typing import Callable


def build_report_email(
    report_text: str,
    sender: str,
    recipient: str,
    subject: str,
    csv_bytes: bytes | None = None,
    csv_filename: str = "maillogsentinel.csv",
) -> EmailMessage:
    """Text report + optional CSV attachment (report.py:424-442)."""
    msg = EmailMessage()
    msg["From"] = sender
    msg["To"] = recipient
    msg["Subject"] = subject
    msg.set_content(report_text)
    if csv_bytes is not None:
        msg.add_attachment(
            csv_bytes,
            maintype="text",
            subtype="csv",
            filename=csv_filename,
        )
    return msg


def send_email(
    msg: EmailMessage,
    host: str = "localhost",
    port: int = 25,
    transport: Callable[[EmailMessage], None] | None = None,
) -> None:
    """Deliver via injected transport, else localhost SMTP
    (report.py:444-447)."""
    if transport is not None:
        transport(msg)
        return
    with smtplib.SMTP(host, port) as s:
        s.send_message(msg)
