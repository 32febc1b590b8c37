"""Executable email delivery (SURVEY.md §2A-A5): the SMTP path is tested
against a real in-process RFC 5321 server (socketserver, stdlib only), so
``SmtpTransport.send`` exercises actual protocol round-trips — EHLO, MAIL
FROM, RCPT TO, DATA, dot-stuffing — not a mock.  No Spark needed."""

from __future__ import annotations

import socketserver
import threading

import pytest

from historic_score_etl_pipeline_spark.sinks.email import (
    FileSpoolTransport,
    SmtpTransport,
    build_error_message,
    send_error_report,
)

TEAM_ERRORS = {"premier-league": "timeout on page 3", "la-liga": "empty table"}
REF_ERRORS = {"serie-a": "missing referee link"}


class _MiniSMTPHandler(socketserver.StreamRequestHandler):
    def handle(self):  # minimal but real RFC 5321 exchange
        self.wfile.write(b"220 minismtp ready\r\n")
        data_mode, buf = False, []
        while True:
            line = self.rfile.readline()
            if not line:
                return
            if data_mode:
                if line.rstrip(b"\r\n") == b".":
                    self.server.messages.append(b"".join(buf))
                    data_mode, buf = False, []
                    self.wfile.write(b"250 OK queued\r\n")
                else:
                    # reverse SMTP dot-stuffing
                    buf.append(line[1:] if line.startswith(b"..") else line)
            else:
                cmd = line.upper()
                if cmd.startswith((b"EHLO", b"HELO")):
                    self.wfile.write(b"250 minismtp\r\n")
                elif cmd.startswith((b"MAIL FROM", b"RCPT TO")):
                    self.wfile.write(b"250 OK\r\n")
                elif cmd.startswith(b"DATA"):
                    data_mode = True
                    self.wfile.write(b"354 end with <CRLF>.<CRLF>\r\n")
                elif cmd.startswith(b"QUIT"):
                    self.wfile.write(b"221 bye\r\n")
                    return
                else:
                    self.wfile.write(b"250 OK\r\n")


@pytest.fixture()
def mini_smtp():
    server = socketserver.ThreadingTCPServer(
        ("127.0.0.1", 0), _MiniSMTPHandler
    )
    server.messages = []
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        yield server
    finally:
        server.shutdown()
        server.server_close()


def test_smtp_transport_delivers_exact_report(mini_smtp):
    transport = SmtpTransport(
        "127.0.0.1", mini_smtp.server_address[1], use_ssl=False
    )
    send_error_report(
        transport, TEAM_ERRORS, REF_ERRORS, "2026-08-14", "2026-08-15",
        sender="pipeline@localhost", recipient="oncall@localhost",
    )
    assert len(mini_smtp.messages) == 1
    wire = mini_smtp.messages[0].decode()
    assert "Subject: Error Logs for 2026-08-14 and 2026-08-15 Extraction." in wire
    assert "Teams' Match History" in wire and "Referee's History" in wire
    assert "premier-league: timeout on page 3" in wire
    # the reference's last-item double-newline special case survives the wire
    assert "la-liga: empty table\r\n\r\nReferee's History" in wire


def test_file_spool_transport_writes_replayable_eml(tmp_path):
    transport = FileSpoolTransport(str(tmp_path))
    path = send_error_report(
        transport, TEAM_ERRORS, REF_ERRORS, "2026-08-14", "2026-08-15"
    )
    import email

    with open(path, "rb") as f:
        msg = email.message_from_binary_file(f)
    assert msg["Subject"] == "Error Logs for 2026-08-14 and 2026-08-15 Extraction."
    assert "serie-a: missing referee link" in msg.get_payload()
    # second send spools a new sequence file (replay order == spool order)
    p2 = send_error_report(transport, TEAM_ERRORS, REF_ERRORS, "a", "b")
    assert p2.endswith("000001.eml") and path.endswith("000000.eml")


def test_message_shape_matches_reference():
    msg = build_error_message(
        TEAM_ERRORS, REF_ERRORS, "t", "tm", "from@x", "to@y"
    )
    assert msg["From"] == "from@x" and msg["To"] == "to@y"
    body = msg.get_content()
    # header line + blank, sections in order, last entries double-spaced
    assert body.startswith("Error Logs for t and tm Extraction.\n\n")
    assert body.index("Teams' Match History") < body.index("Referee's History")
