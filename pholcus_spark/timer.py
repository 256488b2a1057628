"""Timer gating (F15) — named countdown/alarm clocks that pace a rule.

Reference behavior being reproduced: ``app/spider/timer.go``. A spider
registers named clocks (``SetTimer``, timer.go:51-66) and its rules
block on them (``RunTimer`` → ``Timer.sleep``, timer.go:24-47):

- countdown mode (``T``): ``tol`` is a sleep duration (timer.go:153-154).
- alarm mode (``A``): ``bell`` is a time of day and ``tol`` counts the
  wake-up occurrence — if today's bell already rang, sleep to the
  ``tol``-th next bell, else the bell ``tol-1`` days out
  (timer.go:141-152). Validation: ``tol <= 0`` rejects; bell fields
  must be in range (timer.go:103-125).
- ``drop`` wakes every sleeper and closes the registry (timer.go:69-77);
  a closed timer's ``sleep`` returns False.

Spark-first adaptation: the reference's ``RunTimer`` blocks each parse
task. In a distributed micro-batch engine, per-task driver sleeps would
serialize executors, so the engine gates at the ROUND boundary instead:
before dispatching a batch that contains a timer-gated rule's requests,
the driver sleeps that rule's clock once (one pause per batch — the
micro-batch serialization of per-page pacing, the same adaptation the
politeness budget makes for Pausetime). The clock and the sleeper are
injectable, so tests verify the exact computed durations without
wall-clock waits, and the alarm arithmetic has a SQL-expressible mirror
(``queries.q_timer_duration``) oracle-checked against DuckDB.

All arithmetic is UTC epoch-seconds (the reference uses the local
calendar day, timer.go:144-146; UTC is the timezone-independent
serialization of that rule).
"""

from __future__ import annotations

import time as _time
from dataclasses import dataclass

DAY_S = 86400.0

ALARM = "A"
COUNTDOWN = "T"


@dataclass(frozen=True)
class Bell:
    """Alarm time-of-day (timer.go:88-94)."""

    hour: int
    minute: int
    second: int

    def valid(self) -> bool:
        return (
            0 <= self.hour < 24
            and 0 <= self.minute < 60
            and 0 <= self.second < 60
        )

    def seconds_into_day(self) -> int:
        return self.hour * 3600 + self.minute * 60 + self.second


def alarm_duration_s(now_epoch_s: float, bell: Bell, tol_days: int) -> float:
    """Seconds until the tol-th bell — Clock.duration alarm arm
    (timer.go:141-152): today's bell strictly before now → +24h·tol,
    else +24h·(tol−1)."""
    day_start = now_epoch_s - (now_epoch_s % DAY_S)
    bell_s = day_start + bell.seconds_into_day()
    if bell_s < now_epoch_s:
        bell_s += DAY_S * tol_days
    else:
        bell_s += DAY_S * (tol_days - 1)
    return bell_s - now_epoch_s


class Clock:
    """A single named countdown or alarm (timer.go:79-157)."""

    def __init__(self, id: str, tol: float, bell: Bell | None = None):
        self.id = id
        self.tol = tol
        self.bell = bell
        self.typ = COUNTDOWN if bell is None else ALARM

    @staticmethod
    def new(id: str, tol: float, bell: Bell | None = None) -> "Clock | None":
        """newClock validation (timer.go:103-125): tol must be positive;
        alarm bells must be in range. None on invalid parameters."""
        if tol <= 0:
            return None
        if bell is not None and not bell.valid():
            return None
        return Clock(id, tol, bell)

    def duration_s(self, now_epoch_s: float) -> float:
        if self.typ == ALARM:
            assert self.bell is not None
            return alarm_duration_s(now_epoch_s, self.bell, int(self.tol))
        return self.tol


class Timer:
    """Named-clock registry (timer.go:11-77). ``clock``/``sleeper`` are
    injectable (defaults: wall clock + time.sleep) so engine tests can
    record the computed pauses deterministically."""

    def __init__(self, clock=None, sleeper=None):
        self.setting: dict[str, Clock] = {}
        self.closed = False
        self._clock = clock or _time.time
        self._sleeper = sleeper or _time.sleep

    def set(self, id: str, tol: float, bell: Bell | None = None) -> bool:
        """SetTimer (timer.go:51-66): register/replace a named clock;
        False when closed or parameters are invalid."""
        if self.closed:
            return False
        c = Clock.new(id, tol, bell)
        if c is None:
            return False
        self.setting[id] = c
        return True

    def sleep(self, id: str) -> bool:
        """RunTimer (timer.go:24-47): block until the named clock fires;
        False when the timer is closed or the id is unknown."""
        if self.closed:
            return False
        c = self.setting.get(id)
        if c is None:
            return False
        self._sleeper(c.duration_s(self._clock()))
        if self.closed:
            return False
        return id in self.setting

    def drop(self) -> None:
        """Cancel everything and close (timer.go:69-77)."""
        self.closed = True
        self.setting = {}
