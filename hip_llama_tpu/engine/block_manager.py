"""Host-side paged-KV block manager.

The completed version of the reference's embryonic `BatchManager`
(reference: include/BatchManager.hpp:11-52, src/BatchManager.cpp — a
logical->physical KV block mapper whose consumer was never wired in,
thaDNN.cpp:430-567). Here it is the production path: a free-list allocator
over a fixed pool of physical pages, one page table per slot, shared by all
layers. The device side (page-indexed Pallas attention + page-granular KV
writes) lives in models/paged.py and ops/attention.py.
"""

from __future__ import annotations

import dataclasses


class OutOfPagesError(RuntimeError):
    pass


@dataclasses.dataclass
class BlockManager:
    """Maps (slot, logical page) -> physical page over a fixed pool.

    Parity map to the reference (BatchManager.hpp:22-28):
    - free list            <-> mask_physical_KV_block
    - page_tables          <-> logical_KV_table / logicId_physicAddr_mapper
    - alloc()              <-> alloc_new_block (BatchManager.cpp:16-25)
    - append_token()       <-> push_kv_data_to_kv_cache (:55-69)
    - free_slot()          <-> the never-written free path
    """

    num_pages: int
    page_size: int
    num_slots: int

    #: Physical page 0 is RESERVED as the trash page and never allocated.
    #: Idle slots (retired, table cleared) still execute fixed-shape decode
    #: steps, and their KV row writes land at the table's padding target —
    #: page 0. If page 0 were allocatable, an idle slot would clobber a live
    #: request's first page (row 0 of the first-allocated page). The KV pool
    #: must therefore hold num_pages + 1 physical pages (engine/new_cache).
    TRASH_PAGE = 0

    def __post_init__(self):
        # usable physical ids are 1..num_pages; pop() hands out 1 first
        self._free: list[int] = list(range(self.num_pages, 0, -1))
        # page_tables[slot] = list of physical page ids, logical order
        self.page_tables: list[list[int]] = [[] for _ in range(self.num_slots)]

    @property
    def num_free(self) -> int:
        return len(self._free)

    def _alloc(self) -> int:
        if not self._free:
            raise OutOfPagesError(
                f"KV page pool exhausted ({self.num_pages} pages of {self.page_size})"
            )
        return self._free.pop()

    def ensure_capacity(self, slot: int, n_tokens: int) -> list[int]:
        """Ensure the slot's table covers positions [0, n_tokens); returns
        newly allocated physical pages."""
        table = self.page_tables[slot]
        need = -(-n_tokens // self.page_size)  # ceil
        new = []
        while len(table) < need:
            p = self._alloc()
            table.append(p)
            new.append(p)
        return new

    def append_token(self, slot: int, pos: int) -> int | None:
        """Account one token at `pos`; allocates (and returns) a fresh page
        when `pos` opens one."""
        new = self.ensure_capacity(slot, pos + 1)
        return new[0] if new else None

    def free_slot(self, slot: int) -> None:
        self._free.extend(reversed(self.page_tables[slot]))
        self.page_tables[slot] = []

    def table_array(self, slot: int, max_pages: int) -> list[int]:
        """Fixed-width table row. Unused entries point at the reserved trash
        page: attention never reads them (positions >= pos are masked), and
        idle-slot KV writes land there harmlessly."""
        t = self.page_tables[slot]
        return t + [self.TRASH_PAGE] * (max_pages - len(t))
