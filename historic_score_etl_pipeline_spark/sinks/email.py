"""Email error-report transport (SURVEY.md §2A-A5) — the reference's one
behavior that previously had no executable twin.

The reference folds its error dicts into a plain-text body and ships it
over ``smtplib.SMTP_SSL`` as an ``EmailMessage``
(``/root/reference/app/main.py:24-47``).  The body/subject fold is
byte-exact in :func:`sinks.writer.format_error_email` (tested); this
module adds the missing DELIVERY step with two interchangeable
transports:

* :class:`SmtpTransport` — the production path: stdlib ``smtplib``,
  plain or SSL, optional login.  Exercised end-to-end in
  ``tests/test_email_transport.py`` against an in-process RFC 5321
  mini-server, so the send path is tested, not mocked.
* :class:`FileSpoolTransport` — deterministic ``.eml`` spool for
  deployments without SMTP egress (and for CI): the message bytes land
  in a directory, replayable by any MTA later.

Scale note: the error report is driver-side by design — it summarizes
the run's error-channel DataFrame (driver-small: one row per failed
batch, not per failed record), mirroring the reference's one email per
run, not per error.
"""

from __future__ import annotations

import os
import smtplib
from dataclasses import dataclass
from email.message import EmailMessage

from historic_score_etl_pipeline_spark.sinks.writer import format_error_email


def build_error_message(
    team_errors: dict[str, str],
    ref_errors: dict[str, str],
    today: str,
    tomorrow: str,
    sender: str,
    recipient: str,
) -> EmailMessage:
    """EmailMessage in the reference's exact shape (app/main.py:38-43):
    Subject/From/To headers + the byte-exact folded body."""
    subject, body = format_error_email(team_errors, ref_errors, today, tomorrow)
    msg = EmailMessage()
    msg["Subject"] = subject
    msg["From"] = sender
    msg["To"] = recipient
    msg.set_content(body)
    return msg


@dataclass
class SmtpTransport:
    """stdlib smtplib delivery — ``use_ssl=True`` + login reproduces the
    reference's ``SMTP_SSL('smtp.gmail.com', 465)`` + ``login`` flow
    (app/main.py:45-47); plain SMTP covers internal relays."""

    host: str
    port: int
    use_ssl: bool = True
    username: str | None = None
    password: str | None = None
    timeout: float = 30.0

    def send(self, msg: EmailMessage) -> None:
        cls = smtplib.SMTP_SSL if self.use_ssl else smtplib.SMTP
        with cls(self.host, self.port, timeout=self.timeout) as smtp:
            if self.username is not None:
                smtp.login(self.username, self.password or "")
            smtp.send_message(msg)


@dataclass
class FileSpoolTransport:
    """Spool messages as RFC 5322 ``.eml`` files — the egress-free twin.
    File name is a zero-padded sequence number, so spool order is replay
    order; every send appends the next sequence file (an MTA drains the
    directory in order)."""

    spool_dir: str

    def send(self, msg: EmailMessage) -> str:
        os.makedirs(self.spool_dir, exist_ok=True)
        seq = sum(1 for f in os.listdir(self.spool_dir) if f.endswith(".eml"))
        path = os.path.join(self.spool_dir, f"{seq:06d}.eml")
        with open(path, "wb") as f:
            f.write(bytes(msg))
        return path


def send_error_report(
    transport: SmtpTransport | FileSpoolTransport,
    team_errors: dict[str, str],
    ref_errors: dict[str, str],
    today: str,
    tomorrow: str,
    sender: str = "pipeline@localhost",
    recipient: str = "oncall@localhost",
):
    """Build + deliver the run's error report through the given transport
    (the reference's whole ``main()`` tail, app/main.py:24-47)."""
    msg = build_error_message(
        team_errors, ref_errors, today, tomorrow, sender, recipient
    )
    return transport.send(msg)
