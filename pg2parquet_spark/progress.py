"""Live export progress meter (SURVEY §2.A A36).

The reference prints rows/s + MiB/s continuously WHILE writing
(cli/src/parquet_writer.rs:100-151, an indicatif progress bar on stderr).
The Spark-native analog is observation, not instrumentation: a background
thread polls

- bytes landed so far in the output directory, through the Hadoop
  FileSystem API (scheme-resolved: file://, hdfs://, s3a:// all work; the
  in-flight ``_temporary`` task files count, which is exactly "written so
  far" while the job runs), and
- task completion of the active jobs from ``SparkStatusTracker`` (the
  public API; per-task row counts are not exposed to Python, so the live
  row meter is task-granular — exact row totals come from
  ``parquetinfo.write_stats`` after commit).

Everything prints to stderr so stdout stays machine-readable (the CLI and
bench print JSON there).
"""

from __future__ import annotations

import sys
import threading
import time
from collections.abc import Callable


class ProgressReporter:
    """Context manager: emits one progress line per ``interval_s`` during the
    enclosed Spark action, plus a final line on exit.

    ``sink`` receives each formatted line (default: stderr print) — tests
    inject a list-appender to capture output.
    """

    def __init__(
        self,
        spark,
        path: str,
        interval_s: float = 2.0,
        sink: Callable[[str], None] | None = None,
    ) -> None:
        self._spark = spark
        self._path = path
        self._interval = interval_s
        self._sink = sink or (lambda line: print(line, file=sys.stderr))
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._t0 = 0.0

    # -- probes ------------------------------------------------------------
    def _bytes_written(self) -> int:
        try:
            jvm = self._spark._jvm
            p = jvm.org.apache.hadoop.fs.Path(self._path)
            fs = p.getFileSystem(self._spark._jsc.hadoopConfiguration())
            if not fs.exists(p):
                return 0
            return fs.getContentSummary(p).getLength()
        except Exception:  # never let the meter kill the write
            return 0

    def _task_progress(self) -> tuple[int, int]:
        try:
            st = self._spark.sparkContext.statusTracker()
            done = total = 0
            for jid in st.getActiveJobsIds():
                info = st.getJobInfo(jid)
                if info is None:
                    continue
                for sid in info.stageIds:
                    si = st.getStageInfo(sid)
                    if si is None:
                        continue
                    total += si.numTasks
                    done += si.numCompletedTasks
            return done, total
        except Exception:
            return 0, 0

    # -- lifecycle ---------------------------------------------------------
    def _tick(self, final: bool = False) -> None:
        elapsed = max(time.monotonic() - self._t0, 1e-9)
        mib = self._bytes_written() / (1024 * 1024)
        rate = mib / elapsed
        done, total = self._task_progress()
        tasks = "done" if final else f"tasks {done}/{total}"
        self._sink(
            f"[export] {elapsed:6.1f}s  {mib:9.1f} MiB written  "
            f"{rate:7.1f} MiB/s  {tasks}"
        )

    def _run(self) -> None:
        while not self._stop.wait(self._interval):
            self._tick()

    def __enter__(self) -> "ProgressReporter":
        self._t0 = time.monotonic()
        self._thread = threading.Thread(
            target=self._run, name="export-progress", daemon=True
        )
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
        self._tick(final=True)
