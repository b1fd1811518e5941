"""File-backed SQS-semantics test double.

The reference's flagship connector is broadway_sqs
(``guides/examples/amazon-sqs.md``): destructive-read queue, per-message
*delete* acknowledgement, and redelivery via **visibility timeout** —
a received message becomes invisible for N seconds and reappears if not
deleted in time (the reference's documented retry story: "no built-in
retries — redelivery is the producer's job", ``lib/broadway.ex:332-338``).

No AWS in this environment, so this double implements exactly those
queue semantics on a locked JSON state file. It is the *broker*; the
Spark-facing connector is ``sources/sqs.py``. Multi-process safe (Spark
executor tasks call ``delete_batch`` concurrently) via an O_EXCL spin
lock — fine for a single-host test broker; a real deployment points the
same connector surface at SQS itself.

Receipt-handle semantics mirror SQS: each delivery issues a fresh
receipt; deletes with a stale receipt (from a superseded delivery) are
ignored.
"""

from __future__ import annotations

import json
import os
import time


class FakeSQSQueue:
    STATE = "queue.json"
    LOCK = "_queue.lock"

    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

    # -- locking ------------------------------------------------------

    def _acquire(self, timeout_s: float = 30.0) -> None:
        lock = os.path.join(self.path, self.LOCK)
        deadline = time.time() + timeout_s
        while True:
            try:
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.close(fd)
                return
            except FileExistsError:
                if time.time() > deadline:
                    raise TimeoutError(f"queue lock stuck: {lock}")
                time.sleep(0.01)

    def _release(self) -> None:
        try:
            os.remove(os.path.join(self.path, self.LOCK))
        except FileNotFoundError:
            pass

    def _load(self) -> dict:
        try:
            with open(os.path.join(self.path, self.STATE)) as fh:
                return json.load(fh)
        except (FileNotFoundError, json.JSONDecodeError):
            return {"messages": [], "next_id": 0}

    def _save(self, state: dict) -> None:
        tmp = os.path.join(self.path, self.STATE + ".tmp")
        with open(tmp, "w") as fh:
            json.dump(state, fh)
        os.replace(tmp, os.path.join(self.path, self.STATE))

    # -- producer side --------------------------------------------------

    def send_batch(self, bodies: list[dict]) -> list[int]:
        """Enqueue messages; returns their ids."""
        self._acquire()
        try:
            st = self._load()
            ids = []
            for body in bodies:
                mid = st["next_id"]
                st["next_id"] = mid + 1
                st["messages"].append(
                    {
                        "id": mid,
                        "body": body,
                        "visible_at": 0.0,
                        "delivery_count": 0,
                        "receipt": None,
                        "deleted": False,
                    }
                )
                ids.append(mid)
            self._save(st)
            return ids
        finally:
            self._release()

    # -- consumer side --------------------------------------------------

    def receive(
        self,
        max_n: int,
        visibility_timeout_s: float,
        with_bodies: bool = True,
    ) -> list[dict]:
        """Atomically claim up to ``max_n`` visible messages: each gets
        ``delivery_count += 1``, a fresh receipt, and becomes invisible
        for ``visibility_timeout_s``.

        ``with_bodies=False`` returns claims only (id, receipt,
        delivery_count) — the scale-safe driver path: payloads are
        fetched later on executors via ``fetch_bodies``.
        """
        now = time.time()
        self._acquire()
        try:
            st = self._load()
            out = []
            for m in st["messages"]:
                if len(out) >= max_n:
                    break
                if m["deleted"] or m["visible_at"] > now:
                    continue
                m["delivery_count"] += 1
                m["visible_at"] = now + visibility_timeout_s
                m["receipt"] = f"r-{m['id']}-{m['delivery_count']}"
                claim = {
                    "id": m["id"],
                    "receipt": m["receipt"],
                    "delivery_count": m["delivery_count"],
                }
                if with_bodies:
                    claim["body"] = dict(m["body"])
                out.append(claim)
            if out:
                self._save(st)
            return out
        finally:
            self._release()

    def fetch_bodies(self, ids: list[int]) -> dict[int, dict]:
        """Fetch message payloads by id (executor-side companion to a
        ``with_bodies=False`` claim). Lockless: the state file is
        replaced atomically, and a claimed message's body is immutable
        (entries are flagged deleted, never removed), so a plain read
        is consistent."""
        want = set(ids)
        st = self._load()
        return {m["id"]: dict(m["body"]) for m in st["messages"] if m["id"] in want}

    # -- reader progress ------------------------------------------------

    def load_reader_seq(self) -> int:
        """Last trigger seq any reader of this queue has emitted
        (persisted broker-side so a restarted reader resumes past the
        checkpointed offset instead of re-claiming into a seq range the
        planned batch will never read)."""
        return int(self._load().get("reader_seq", 0))

    def store_reader_seq(self, seq: int) -> None:
        self._acquire()
        try:
            st = self._load()
            st["reader_seq"] = max(int(st.get("reader_seq", 0)), int(seq))
            self._save(st)
        finally:
            self._release()

    def delete_batch(self, receipts: list[str]) -> int:
        """Ack: delete messages by *current* receipt (stale receipts are
        ignored, as in SQS). Returns the number actually deleted."""
        want = set(receipts)
        if not want:
            return 0
        self._acquire()
        try:
            st = self._load()
            n = 0
            for m in st["messages"]:
                if not m["deleted"] and m["receipt"] in want:
                    m["deleted"] = True
                    n += 1
            if n:
                self._save(st)
            return n
        finally:
            self._release()

    def change_visibility(self, receipt: str, timeout_s: float) -> bool:
        """SQS ChangeMessageVisibility — e.g. 0 for immediate retry."""
        self._acquire()
        try:
            st = self._load()
            for m in st["messages"]:
                if not m["deleted"] and m["receipt"] == receipt:
                    m["visible_at"] = time.time() + timeout_s
                    self._save(st)
                    return True
            return False
        finally:
            self._release()

    def counts(self) -> dict:
        now = time.time()
        st = self._load()
        c = {"visible": 0, "inflight": 0, "deleted": 0}
        for m in st["messages"]:
            if m["deleted"]:
                c["deleted"] += 1
            elif m["visible_at"] > now:
                c["inflight"] += 1
            else:
                c["visible"] += 1
        return c
