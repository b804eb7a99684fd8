"""DB-backed readers/writers over the persist DAOs.

The DB twins of the fs JSON readers/writers (reference dataio/db/*):
DBCDMIPsReader/Writer, DBNeuronMatchesReader/Writer, DBCDScoresOnlyWriter.
"""

from __future__ import annotations

from typing import Sequence

from colormipsearch_tpu.model import CDMatch, Neuron, ProcessingType
from colormipsearch_tpu.persist import DaosProvider
from colormipsearch_tpu.persist.requests import (
    NeuronSelector,
    PagedRequest,
    ScoresFilter,
    SortCriteria,
)


class DBCDMIPsReader:
    def __init__(self, daos: DaosProvider):
        self._dao = daos.neuron_metadata_dao

    def read_mips(self, libraries: Sequence[str], *,
                  alignment_space=None, tags=(), names=(),
                  offset: int = 0, size: int = -1) -> list[Neuron]:
        sel = NeuronSelector(alignment_space=alignment_space,
                             libraries=list(libraries),
                             tags=list(tags), names=list(names))
        page = PagedRequest(offset=offset, size=max(size, 0))
        return self._dao.find_neurons(sel, page)


class DBCDMIPsWriter:
    def __init__(self, daos: DaosProvider):
        self._dao = daos.neuron_metadata_dao

    def write(self, neurons: Sequence[Neuron]) -> int:
        for n in neurons:
            self._dao.create_or_update(n)
        return len(neurons)

    def add_processing_tags(self, neurons, ptype: ProcessingType,
                            tags) -> int:
        return self._dao.add_processing_tags(neurons, ptype, tags)


class DBNeuronMatchesWriter:
    def __init__(self, daos: DaosProvider):
        self._dao = daos.cd_matches_dao

    def write(self, matches: Sequence[CDMatch]) -> int:
        return self._dao.create_or_update_all(matches)

    def write_updates(self, matches: Sequence[CDMatch],
                      _field_selectors=None) -> int:
        return self._dao.update_scores(matches)


class DBNeuronMatchesReader:
    def __init__(self, daos: DaosProvider):
        self._daos = daos
        self._dao = daos.cd_matches_dao

    def list_matches_locations(self, mask_libraries: Sequence[str],
                               tags=()) -> list[str]:
        """DB 'locations' are the distinct mask mip ids
        (DBNeuronMatchesReader.listMatchesLocations)."""
        sel = NeuronSelector(libraries=list(mask_libraries),
                             tags=list(tags))
        return self._dao.mask_mip_ids(sel)

    def read_matches_by_mask(self, mask_mip_id: str, *,
                             min_ratio: float = 0.0) -> list[CDMatch]:
        sel = NeuronSelector(mip_ids=[mask_mip_id])
        scores = ScoresFilter()
        if min_ratio > 0:
            scores.add("matchingPixelsRatio", min_ratio)
        page = PagedRequest(sort=[SortCriteria("normalizedScore",
                                               ascending=False)])
        return self._dao.find_matches_by_mask(
            sel, scores_filter=scores, page=page)
