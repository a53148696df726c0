"""S11 email sink: message assembly + injected transport (no network),
mirroring the reference's mocked-smtplib tests."""

from maillogsentinel_spark.report.email_sink import build_report_email, send_email


def test_build_report_email_with_attachment():
    msg = build_report_email(
        "Total authentication failures today: 2\n",
        sender="sentinel@mx1",
        recipient="admin@example.com",
        subject="[MailLogSentinel] daily report",
        csv_bytes=b"server;date;ip\nmx1;10/01/2025 04:05;1.2.3.4\n",
    )
    assert msg["From"] == "sentinel@mx1"
    assert msg["To"] == "admin@example.com"
    body = msg.get_body(("plain",)).get_content()
    assert "Total authentication failures" in body
    atts = list(msg.iter_attachments())
    assert len(atts) == 1
    assert atts[0].get_filename() == "maillogsentinel.csv"
    assert b"mx1;10/01/2025" in atts[0].get_content().encode()


def test_send_email_uses_injected_transport():
    sent = []
    msg = build_report_email("body", "a@x", "b@y", "s")
    send_email(msg, transport=sent.append)
    assert sent == [msg]
    assert sent[0]["Subject"] == "s"
