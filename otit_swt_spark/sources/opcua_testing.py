"""In-process fake OPC UA history server for transport-level tests (the
Flight-source in-process-server pattern applied to OPC UA). Lives in the
package — not the test tree — because executor workers must be able to
import it by reference when the session factory is shipped into
``mapInPandas`` partitions.
"""

from __future__ import annotations


class FakeOPCUAServer:
    """In-process OPC UA history server speaking the HistoryRead
    request/response shapes (the Flight-source pattern applied to OPC UA):
    per-node raw pages with continuation points, and server-side processed
    aggregation over intervals anchored at details.start_time. Picklable,
    so executor partitions can each 'connect' (factory = the instance)."""

    def __init__(self, series: dict[str, list[tuple[float, float]]],
                 page_size: int = 100):
        self.series = {k: sorted(v) for k, v in series.items()}
        self.page_size = page_size
        self.calls = 0

    def __call__(self):            # session_factory protocol
        return self

    def history_read(self, details, timestamps_to_return, release, nodes):
        from otit_swt_spark.sources import opcua as O

        self.calls += 1
        if isinstance(details, O.ReadProcessedDetails) and \
                len(details.aggregate_type) != len(nodes):
            # OPC UA Part 11 §6.4.4: the aggregateType array size shall
            # match nodesToRead — real servers reject the request, and a
            # continuation re-request for a SUBSET of nodes must carry a
            # matching subset of aggregates
            raise ValueError(
                f"Bad_InvalidArgument: {len(details.aggregate_type)} "
                f"aggregates for {len(nodes)} nodes_to_read")
        out = []
        for hrvi in nodes:
            key = hrvi.node_id.to_string()
            pts = [p for p in self.series.get(key, [])
                   if details.start_time <= p[0] < details.end_time]
            if isinstance(details, O.ReadProcessedDetails):
                agg_node = details.aggregate_type[len(out)]
                name = {v: k for k, v in O.OPCUA_AGG_FUNC.items()}[agg_node]
                ival = (details.processing_interval or 0.0) / 1000.0
                buckets: dict[float, list[float]] = {}
                for ts, v in pts:
                    b = details.start_time if ival == 0 else \
                        details.start_time + ival * ((ts - details.start_time) // ival)
                    buckets.setdefault(b, []).append(v)
                fn = {"Average": lambda xs: sum(xs) / len(xs),
                      "Total": sum, "Minimum": min, "Maximum": max,
                      "Count": len}[name]
                all_dvs = tuple(O.DataValue(float(fn(vs)), b)
                                for b, vs in sorted(buckets.items()))
                # processed reads page too (real servers hand back
                # continuation points when many intervals are requested)
                off = int(hrvi.continuation_point or b"0")
                page = all_dvs[off:off + self.page_size]
                nxt = off + len(page)
                cp = str(nxt).encode() if nxt < len(all_dvs) else b""
                out.append(O.HistoryReadResult(
                    continuation_point=cp,
                    history_data=O.HistoryData(page)))
            else:
                off = int(hrvi.continuation_point or b"0")
                # Protocol guard (OPC UA Part 11 §6.4.5 HistoryReadValueId
                # semantics): a continuation RE-request must carry only
                # nodes that handed back a continuation point — a client
                # that re-sends already-drained nodes (offset 0 mixed into
                # a nonzero-offset request) would double-read them on a
                # real server. Raising here makes the transport's
                # pending-subset loop a tested invariant, not a comment.
                offs = [int(h.continuation_point or b"0") for h in nodes]
                if any(o > 0 for o in offs) and any(o == 0 for o in offs):
                    raise ValueError(
                        "Bad_ContinuationPointInvalid: request mixes "
                        "fresh nodes into a continuation re-request")
                if off % self.page_size or off > len(pts):
                    raise ValueError(
                        f"Bad_ContinuationPointInvalid: offset {off}")
                page = pts[off:off + self.page_size]
                nxt = off + len(page)
                cp = str(nxt).encode() if nxt < len(pts) else b""
                out.append(O.HistoryReadResult(
                    continuation_point=cp,
                    history_data=O.HistoryData(tuple(
                        O.DataValue(v, ts) for ts, v in page))))
        return out
