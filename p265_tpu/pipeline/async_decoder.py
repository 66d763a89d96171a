"""Pipelined decoder: host Stage-A parse overlaps device Stage-B recon.

The parser thread runs ahead (it needs only syntax state -- including the
TMVP collocated-MV grids, which are complete at end of parse), submitting
reconstruction jobs to a single ordered worker.  Reference Picture objects
are created as shells at parse time; the worker fills their planes strictly
in decode order, so a dependent picture's MC always sees finished references
(SURVEY.md 7.1 stage overlap).
"""
from __future__ import annotations

import queue
import threading
import time

import numpy as np

from p265_tpu.dpb.dpb import NO_REF, Picture
from p265_tpu.golden.decoder import DecodedFrame
from p265_tpu.hls import nal
from p265_tpu.pipeline.decoder import TpuDecoder


class PipelinedTpuDecoder(TpuDecoder):
    def __init__(self, **kw):
        super().__init__(**kw)
        self._q: queue.Queue = queue.Queue(maxsize=4)
        self._worker = None
        self._worker_err = None

    def _ensure_worker(self):
        if self._worker is None:
            self._worker = threading.Thread(target=self._run_worker,
                                            daemon=True)
            self._worker.start()

    def _run_worker(self):
        while True:
            job = self._q.get()
            if job is None:
                return
            try:
                self._recon_job(*job)
            except Exception as e:  # surfaced on flush
                self._worker_err = e
            finally:
                self._q.task_done()

    def _recon_job(self, pic_st, pic, frame, refs):
        t1 = time.perf_counter()
        plan = pic_st["plan"]
        prefilter = self._reconstruct(plan, {p: r.planes for p, r in
                                             refs.items()})
        t2 = time.perf_counter()
        planes = [np.asarray(p).copy() for p in prefilter]
        if self.apply_filters:
            planes = self._filters(plan, planes)
        # fill the shells in place: later jobs read pic.planes
        pic.planes = planes
        frame.planes = planes
        frame.prefilter = prefilter
        t3 = time.perf_counter()
        self.stats["recon_s"] += t2 - t1
        self.stats["filter_s"] += t3 - t2

    # parse-side picture completion: bookkeeping only, recon goes to the queue
    def _finish_picture(self) -> None:
        pic_st = getattr(self, "_pic", None)
        self._pic = None
        if pic_st is None:
            return
        if pic_st["ctbs"] != pic_st["sps"].num_ctbs:
            raise ValueError("picture incomplete: "
                             f"{pic_st['ctbs']}/{pic_st['sps'].num_ctbs} CTUs")
        self._ensure_worker()
        plan, mctx, sps = pic_st["plan"], pic_st["mctx"], pic_st["sps"]
        poc = pic_st["poc"]
        frame = DecodedFrame(poc, None, None, plan)
        pic = Picture(poc, None,
                      is_reference=nal.is_reference_nal(pic_st["nal_type"]))
        pic.user = frame
        if mctx is not None:
            pic.col_mv = mctx.mv[::4, ::4].copy()
            pic.col_ref_poc = mctx.ref_poc[::4, ::4].copy()
            pic.col_is_long_term = mctx.lt[::4, ::4].copy()
        else:
            h16 = (sps.pic_height + 15) >> 4
            w16 = (sps.pic_width + 15) >> 4
            pic.col_mv = np.zeros((h16, w16, 2, 2), np.int32)
            pic.col_ref_poc = np.full((h16, w16, 2), NO_REF, np.int32)
            pic.col_is_long_term = np.zeros((h16, w16, 2), bool)
        refs = {p.poc: p for p in self.dpb.pics if p.is_reference}
        self.stats["frames"] += 1
        self.stats["slice_bytes"] += pic_st["bytes"]
        self.stats["tus"] += len(plan.tus)
        self.stats["ctbs"] += sps.num_ctbs
        self._decoded.append(frame)
        self.dpb.insert(pic)
        self._q.put((pic_st, pic, frame, refs))

    def flush(self):
        if getattr(self, "_pic", None) is not None:
            self._finish_picture()
        if self._worker is not None:
            self._q.join()
        if self._worker_err is not None:
            raise self._worker_err
        if self.dpb is None:
            return []
        self.dpb.flush()
        return [p.user for p in self.dpb.outputs]
