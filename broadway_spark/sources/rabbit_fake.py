"""File-backed RabbitMQ-semantics test double (AMQP 0-9-1 consumer
surface).

The reference's fourth official connector family is RabbitMQ
(``guides/examples/rabbitmq.md``), whose ack model is channel-scoped
and distinct from offset commit, delete-as-ack, and ack-deadline
leases:

- the broker **pushes** deliveries to a consumer over a *channel*;
  ``prefetch_count`` caps the number of unacknowledged deliveries a
  channel may hold — the connector's documented back-pressure knob
  (the guide's "Tuning the configuration" section);
- every delivery carries a channel-scoped, monotonically increasing
  ``delivery_tag``; redeliveries of a requeued message set the
  ``redelivered`` flag;
- ``basic.ack(tag, multiple)`` acknowledges one tag, or — with
  ``multiple=True`` — every outstanding tag ≤ ``tag`` (cumulative
  ack, the bulk-ack shape unique to this family);
- ``basic.nack(tag, requeue)`` either returns the message to the
  ready queue (``requeue=True``, broadway_rabbitmq's
  ``on_failure: :reject_and_requeue``) or drops it to the
  dead-letter exchange (``requeue=False``, ``:reject``);
- closing a channel (connection drop, consumer crash) requeues every
  unacked delivery it held — Rabbit's built-in crash redelivery.

No broker in this environment, so this double implements exactly those
semantics on a locked JSON state file; the Spark-facing connector is
``sources/rabbit.py``. Locking mirrors the SQS/PubSub doubles.
"""

from __future__ import annotations

import json
import os
import time


class FakeRabbitQueue:
    STATE = "rabbit.json"
    LOCK = "_rabbit.lock"

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
                    raise TimeoutError(f"rabbit lock stuck: {lock}")
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
            return {"messages": [], "next_id": 0, "channels": {}}

    def _save(self, state: dict) -> None:
        tmp = os.path.join(self.path, self.STATE + ".tmp")
        with open(tmp, "w") as fh:
            json.dump(state, fh)
        os.replace(tmp, os.path.join(self.path, self.STATE))

    # -- publisher side -----------------------------------------------

    def publish(self, bodies: list[dict]) -> list[int]:
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
                        # ready | unacked | acked | dead
                        "state": "ready",
                        "redelivered": False,
                        "channel": None,
                        "delivery_tag": None,
                    }
                )
                ids.append(mid)
            self._save(st)
            return ids
        finally:
            self._release()

    # -- channel lifecycle --------------------------------------------

    def open_channel(self, channel_id: str, prefetch_count: int) -> None:
        """Open (or reopen) a consumer channel with ``basic.qos``
        prefetch. Reopening an existing channel id first closes it —
        requeueing its unacked deliveries, exactly what a dropped
        connection does."""
        self._acquire()
        try:
            st = self._load()
            if channel_id in st["channels"]:
                self._requeue_channel(st, channel_id)
            st["channels"][channel_id] = {
                "next_tag": 1,
                "prefetch": int(prefetch_count),
                "unacked": {},  # delivery_tag (str) -> message id
            }
            self._save(st)
        finally:
            self._release()

    def close_channel(self, channel_id: str) -> int:
        """Close the channel; every unacked delivery requeues
        (``redelivered`` will be set on next delivery). Returns the
        number requeued."""
        self._acquire()
        try:
            st = self._load()
            n = self._requeue_channel(st, channel_id)
            st["channels"].pop(channel_id, None)
            self._save(st)
            return n
        finally:
            self._release()

    @staticmethod
    def _requeue_channel(st: dict, channel_id: str) -> int:
        ch = st["channels"].get(channel_id)
        if not ch:
            return 0
        ids = set(ch["unacked"].values())
        n = 0
        for m in st["messages"]:
            if m["id"] in ids and m["state"] == "unacked":
                m["state"] = "ready"
                m["redelivered"] = True
                m["channel"] = None
                m["delivery_tag"] = None
                n += 1
        ch["unacked"] = {}
        return n

    # -- consumer side ------------------------------------------------

    def deliver(
        self, channel_id: str, max_n: int, with_bodies: bool = True
    ) -> list[dict]:
        """Push up to ``min(max_n, prefetch - unacked)`` ready messages
        to the channel — the prefetch window IS the admission cap; a
        channel sitting on ``prefetch_count`` unacked deliveries
        receives nothing until it acks (the documented back-pressure
        contract)."""
        self._acquire()
        try:
            st = self._load()
            ch = st["channels"].get(channel_id)
            if ch is None:
                raise ValueError(f"channel not open: {channel_id}")
            budget = min(max_n, ch["prefetch"] - len(ch["unacked"]))
            out = []
            for m in st["messages"]:
                if len(out) >= budget:
                    break
                if m["state"] != "ready":
                    continue
                tag = ch["next_tag"]
                ch["next_tag"] = tag + 1
                m["state"] = "unacked"
                m["channel"] = channel_id
                m["delivery_tag"] = tag
                ch["unacked"][str(tag)] = m["id"]
                d = {
                    "id": m["id"],
                    "delivery_tag": tag,
                    "redelivered": m["redelivered"],
                }
                if with_bodies:
                    d["body"] = dict(m["body"])
                out.append(d)
            if out:
                self._save(st)
            return out
        finally:
            self._release()

    def fetch_bodies(self, ids: list[int]) -> dict[int, dict]:
        """Executor-side payload fetch for claims-only deliveries.
        Lockless: atomic state replace + immutable bodies."""
        want = set(ids)
        st = self._load()
        return {m["id"]: dict(m["body"]) for m in st["messages"] if m["id"] in want}

    def basic_ack(
        self, channel_id: str, delivery_tag: int, multiple: bool = False
    ) -> int:
        """``basic.ack``: settle one delivery, or with ``multiple``
        every outstanding tag ≤ ``delivery_tag`` (cumulative — the
        family's native bulk ack). Unknown/stale tags are ignored, as
        the broker ignores already-settled tags."""
        return self._settle(channel_id, delivery_tag, multiple, "acked")

    def basic_nack(
        self,
        channel_id: str,
        delivery_tag: int,
        requeue: bool,
        multiple: bool = False,
    ) -> int:
        """``basic.nack``: requeue (→ ready, redelivered flag) or drop
        to the dead-letter store (→ dead)."""
        target = "ready" if requeue else "dead"
        return self._settle(channel_id, delivery_tag, multiple, target)

    def _settle(
        self, channel_id: str, delivery_tag: int, multiple: bool, target: str
    ) -> int:
        self._acquire()
        try:
            st = self._load()
            ch = st["channels"].get(channel_id)
            if ch is None:
                return 0
            if multiple:
                tags = [t for t in ch["unacked"] if int(t) <= delivery_tag]
            else:
                tags = [str(delivery_tag)] if str(delivery_tag) in ch["unacked"] else []
            ids = {ch["unacked"][t] for t in tags}
            n = 0
            for m in st["messages"]:
                if m["id"] in ids and m["state"] == "unacked":
                    m["state"] = target
                    if target == "ready":
                        m["redelivered"] = True
                    m["channel"] = None
                    m["delivery_tag"] = None
                    n += 1
            for t in tags:
                del ch["unacked"][t]
            if n:
                self._save(st)
            return n
        finally:
            self._release()

    # -- reader progress ----------------------------------------------

    def load_reader_seq(self) -> int:
        return int(self._load().get("reader_seq", 0))

    def store_reader_seq(self, seq: int) -> None:
        self._acquire()
        try:
            st = self._load()
            st["reader_seq"] = max(int(st.get("reader_seq", 0)), int(seq))
            self._save(st)
        finally:
            self._release()

    # -- observability ------------------------------------------------

    def counts(self) -> dict:
        st = self._load()
        c = {"ready": 0, "unacked": 0, "acked": 0, "dead": 0}
        for m in st["messages"]:
            c[m["state"]] += 1
        return c
