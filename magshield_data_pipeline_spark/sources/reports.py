"""Report-file readers (SURVEY §2.1 S6/S7) and the mail-report ingest
pipeline (S5 + F11/F12/F14 — /root/reference/modules/opportunity_stage.py).

The reference receives an emailed report: it scans the mailbox with a
server-side filter + sort + limit, finds the newest matching message,
pulls the "Download Report" anchor's href out of the HTML body, recovers
the real filename from the redirect's ``?url=`` parameter, then sniffs
CSV-vs-Excel and parses (opportunity_stage.py:56-80, 85-115, 131-165).
Here the mailbox is any DataFrame with (ts, sender, subject, body_html)
— the scan semantics are the mail_scan_topn query's; this module is the
composition that turns the winning message into a parsed DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from magshield_data_pipeline_spark.functions import scalars as S


def read_csv(spark: SparkSession, path: str) -> DataFrame:
    """S6 — header CSV read. Schema inference is a dev convenience here;
    production ingest declares the schema (SURVEY §1.4)."""
    return spark.read.option("header", True).option("inferSchema", True).csv(path)


def read_excel(spark: SparkSession, path: str) -> DataFrame:
    """S7 — Excel via the pandas bridge (driver-side, small files by
    definition — the reference reads one emailed workbook)."""
    try:
        import pandas as pd

        return spark.createDataFrame(pd.read_excel(path))
    except ImportError as e:  # openpyxl missing in minimal images
        raise NotImplementedError(
            "Excel ingest needs openpyxl; convert the report to CSV or "
            "install openpyxl"
        ) from e


def sniff_and_read(spark: SparkSession, path: str) -> DataFrame:
    """The reference sniffs CSV by looking at the head bytes
    (opportunity_stage.py:56-64); a filename check plus the same head
    probe covers the emailed-report cases."""
    if path.lower().endswith(".csv"):
        return read_csv(spark, path)
    if path.lower().endswith((".xlsx", ".xls")):
        return read_excel(spark, path)
    with open(path, "rb") as f:
        head = f.read(4096)
    first_line = head.splitlines()[0] if head else b""
    if head.startswith(b'"') or b"," in first_line:
        return read_csv(spark, path)
    return read_excel(spark, path)


def latest_report_message(
    mail: DataFrame,
    sender: str,
    subject_contains: str,
    since_ts: str,
    scan_top: int = 5,
) -> DataFrame:
    """S5 + O1/O2 — newest matching message: server-side predicate +
    ORDER BY ts DESC LIMIT scan_top, then subject filter + top-1
    (opportunity_stage.py:131-165). TakeOrderedAndProject keeps this a
    per-partition top-n at any scale."""
    return (
        mail.filter(
            (F.col("receivedDateTime") >= F.lit(since_ts))
            & (F.col("sender_address") == sender)
        )
        .orderBy(F.col("receivedDateTime").desc(), F.col("message_id").desc())
        .limit(scan_top)
        .filter(F.col("subject").contains(subject_contains))
        .orderBy(F.col("receivedDateTime").desc(), F.col("message_id").desc())
        .limit(1)
    )


def extract_report_link(message: DataFrame, anchor_text: str = "Download Report") -> DataFrame:
    """F11 + F12 + F14 — anchor href out of the HTML body, real filename
    from the redirect's ``?url=`` parameter, plus its basename."""
    href = S.extract_download_href(F.col("body_html"), anchor_text)
    real_url = S.url_query_param(href, "url")
    return message.select(
        "message_id",
        href.alias("href"),
        real_url.alias("report_url"),
        S.basename(real_url).alias("report_filename"),
    )
