"""Compat ``zavod.shed.wikidata``: the Wikidata enrichment family.

The reference builds on the public ``nomenklatura.wikidata`` client
(Item/Claim/LangText model + SPARQL/entity-API transport) and rigour's
territory registry — third-party boundaries here, like lxml or the
unblocking proxy. The CLIENT is a registered seam
(``client.register_wikidata_client_factory``); the traversal/filter
logic (human/country/igo/position) operates on whatever client a
deployment wires, against the documented minimal Item protocol
(``client.py`` docstring). Unregistered → loud NotImplementedError at
the boundary.
"""
