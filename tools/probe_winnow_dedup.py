"""Winnowing near-dup precision sweep (r10 VERDICT #6): measure the
min_shared candidate knob and the Jaccard verifier on realistic (non
template-synthetic) English prose, the way the semsearch recall curve
and retrieval-mining sweeps ground their knobs.

Fixture: 12 hand-written paragraphs on unrelated topics; for each, a
true near-dup (a copy with ~10-15% of words edited and a clause
inserted -- the re-crawl/boilerplate-edit case); 6 distractors sharing
everyday vocabulary; and 4 'lifted' documents embedding ONE verbatim
sentence from a base inside otherwise-unrelated prose (the
plagiarism case winnowing exists for: a substring witness that
whole-document gram sets dilute).

Run: python tools/probe_winnow_dedup.py
Floors pinned in tests/test_winnow_neardup.py; table in SCALE.md r11.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASES = [
    "The storm rolled in from the west just after noon, and within an hour "
    "the harbor was empty of boats. Fishermen stacked their crab pots along "
    "the sea wall and watched the pressure gauge fall. By evening the rain "
    "came sideways, rattling the shutters of the cannery and flooding the "
    "gravel lot behind the fuel dock.",
    "To make a proper stock, roast the bones first until they are deeply "
    "browned, then cover them with cold water and bring it barely to a "
    "simmer. Skim the foam in the first half hour, add the onions, carrots "
    "and celery only after that, and let the pot breathe at a lazy bubble "
    "for the rest of the afternoon.",
    "The night train to the border leaves from the old platform at the far "
    "end of the station, past the shuttered newspaper kiosk. Seasoned "
    "travelers bring their own blankets, because the heating in the rear "
    "carriages fails somewhere in the mountains, and the dining car stops "
    "serving tea an hour before the frontier checkpoint.",
    "Tomatoes want deep, infrequent watering and resent wet leaves, so "
    "irrigate at the roots in the early morning. Pinch the suckers that "
    "sprout between the main stem and the branches, stake the vines before "
    "the first fruit sets, and feed the beds with compost when the flowers "
    "open rather than when the seedlings go in.",
    "Through a small telescope the rings of Saturn appear as a single "
    "bright ellipse, but on a night of steady air you can catch the dark "
    "gap that divides them. Jupiter rewards patience differently: its four "
    "bright moons shuffle positions hour by hour, and the great cloud "
    "bands drift visibly across a single evening.",
    "The quartet rehearsed the slow movement for three weeks before anyone "
    "played it at full volume. The cellist insisted on bowing near the "
    "bridge for the opening bars, the violist argued for a rounder tone, "
    "and in the end the first violin settled it by playing the phrase once, "
    "very quietly, the way it was finally performed.",
    "When the mill closed, the town's economy bent but did not break. The "
    "machine shops retooled for tractor parts, the bank extended harvest "
    "loans a season longer than the auditors liked, and the freight siding "
    "that once moved lumber began loading seed corn instead. Wages fell "
    "for two years and then slowly recovered.",
    "The marathon's final miles run along the river, where the wind comes "
    "off the water and the crowds thin to a scattering of volunteers with "
    "paper cups. Experienced runners bank their effort for this stretch, "
    "holding back on the early hills so they have something left when the "
    "course turns into the open headwind.",
    "The treaty was signed in a tent pitched halfway between the two camps, "
    "on a table borrowed from a farmhouse kitchen. Each delegation copied "
    "the terms by hand through the night, and by morning the couriers were "
    "already riding for the coast, carrying duplicate documents sealed in "
    "oilcloth against the spring rains.",
    "A sprained ankle swells because the torn vessels leak into the joint, "
    "so the first hours matter most: rest it, ice it in short intervals, "
    "wrap it firmly but not tightly, and keep it raised above the heart. "
    "Weight-bearing can resume when walking no longer sharpens the pain, "
    "usually within a few days for a mild tear.",
    "Cut the tenons a hair fat and shave them to fit; a joint that slides "
    "together dry and holds its own weight will be stronger than any "
    "clamped glue line. Check the shoulders with a square before assembly, "
    "because a gap there telegraphs through the finished frame no matter "
    "how carefully the mortise was chopped.",
    "Trout feed into the current, so approach the pool from downstream and "
    "keep your shadow off the water. Cast above the seam where fast water "
    "meets slow, let the fly drift without drag, and if a fish rises short, "
    "rest the pool before showing it the same pattern again from a longer "
    "lead.",
]

EDITS = [
    ("storm", "front"), ("harbor", "marina"), ("rain", "squall"),
    ("roast", "brown"), ("simmer", "tremble"), ("afternoon", "day"),
    ("train", "express"), ("blankets", "quilts"), ("tea", "coffee"),
    ("watering", "soaking"), ("stake", "tie"), ("compost", "manure"),
    ("telescope", "refractor"), ("steady", "calm"), ("drift", "slide"),
    ("rehearsed", "practiced"), ("bowing", "playing"), ("phrase", "line"),
    ("economy", "fortunes"), ("loans", "credit"), ("wages", "incomes"),
    ("river", "water"), ("crowds", "spectators"), ("effort", "energy"),
    ("treaty", "accord"), ("couriers", "riders"), ("sealed", "wrapped"),
    ("swells", "balloons"), ("ice", "chill"), ("raised", "propped"),
    ("tenons", "tongues"), ("square", "gauge"), ("frame", "carcase"),
    ("current", "flow"), ("shadow", "outline"), ("pattern", "fly"),
]

DISTRACTORS = [
    "The committee met on Tuesday and again on Friday, and both times the "
    "discussion returned to the budget for the coming year. Several members "
    "wanted the figures broken out by department before voting, and the "
    "chair agreed to circulate a revised schedule over the weekend.",
    "Morning light in the valley arrives late, filtered through the ridge "
    "line, and the frost holds in the shaded fields until almost ten. The "
    "school bus makes its loop twice, once for the far farms and once for "
    "the houses along the paved road.",
    "Most of the letters in the archive are routine: orders for supplies, "
    "acknowledgments of payment, notes about the weather delaying a "
    "shipment. But every few boxes there is a page of real life, a "
    "complaint about a neighbor or a line of worry about a son abroad.",
    "The bakery opens at six but the ovens have been on since three, and "
    "by the time the first customers arrive the racks are already full. "
    "Regulars know to come before eight on Saturdays, because the seeded "
    "loaves sell out before the market stalls open.",
    "A good map of the trail system shows not just the paths but the "
    "water: where the creeks cross, which springs run in summer, where the "
    "beaver ponds flood the low route in wet years. Rangers update the "
    "board at the trailhead monthly.",
    "The library's reading room keeps its tall windows open in summer, and "
    "the sound of the courtyard fountain carries over the desks. Students "
    "claim the corner tables early; the carrels by the stacks go to "
    "whoever arrives after lunch.",
]

LIFTED_WRAP = [
    "The inspection report ran to forty pages of routine findings. {s} "
    "The appendix listed the serial numbers of every gauge checked.",
    "Her notebook from that summer mixes recipes with observations. {s} "
    "Two pages later she returns to the subject of pickling.",
    "The manual's third chapter is mostly warnings in bold type. {s} "
    "Nothing else in the chapter mentions the subject again.",
    "He closed the letter with family news and one odd paragraph. {s} "
    "The postscript asks about the price of winter feed.",
]


def build_docs():
    """Returns (rows, true_pairs, lifted_pairs): base ids 0..11, dups
    100+i, distractors 200+, lifted 300+."""
    rows = []
    for i, b in enumerate(BASES):
        rows.append((i, b))
        d = b
        for find, repl in EDITS[3 * i: 3 * i + 3]:
            d = d.replace(find, repl, 1)
        d = d + " A brief note was added at the end of the season."
        rows.append((100 + i, d))
    for j, t in enumerate(DISTRACTORS):
        rows.append((200 + j, t))
    lifted_pairs = []
    for m, wrap in enumerate(LIFTED_WRAP):
        # lift the first sentence of base m verbatim
        sent = BASES[m].split(". ")[0] + "."
        rows.append((300 + m, wrap.format(s=sent)))
        lifted_pairs.append((m, 300 + m))
    true_pairs = [(i, 100 + i) for i in range(len(BASES))]
    return rows, set(true_pairs), set(lifted_pairs)


def main():
    from pg_auto_dw_spark.functions.text import (
        winnow_fingerprints,
        winnow_near_dup_pairs,
        winnow_overlap_pairs,
    )
    from pg_auto_dw_spark.session import get_spark

    spark = get_spark("probe-winnow-dedup")
    rows, true_pairs, lifted_pairs = build_docs()
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")

    # Two DIFFERENT ground truths, because the two stages answer two
    # different questions. The candidate stage witnesses SHARED
    # SUBSTRINGS, and by construction those are: the 12 near-dup
    # pairs, the 4 (base, lifted) pairs, the 4 (dup, lifted) pairs
    # (the dup keeps the lifted sentence), and the 66 dup-dup pairs
    # sharing the appended footer sentence -- shared boilerplate, the
    # thing real corpora are full of. The verifier answers the
    # whole-document near-dup question (the 12 pairs only).
    dup_lifted = {(100 + m, 300 + m) for m in range(len(lifted_pairs))}
    n_dups = len(true_pairs)
    footer = {
        (100 + i, 100 + j) for i in range(n_dups) for j in range(n_dups) if i < j
    }
    substring_truth = true_pairs | lifted_pairs | dup_lifted | footer

    report = {}
    for k, w in ((8, 4), (16, 8), (24, 8)):
        fps = winnow_fingerprints(docs, k=k, w=w).localCheckpoint(eager=True)
        for min_shared in (1, 2, 3, 5, 8):
            cand = {
                (r["id_a"], r["id_b"])
                for r in winnow_overlap_pairs(
                    fps, min_shared=min_shared
                ).collect()
            }
            verified = {
                (r["id_a"], r["id_b"])
                for r in winnow_near_dup_pairs(
                    docs, k=k, w=w, min_shared=min_shared,
                    jaccard_threshold=0.4,
                ).collect()
            }

            def stats(pairs, truth):
                n = len(pairs)
                tp = len(pairs & truth)
                return {
                    "pairs": n,
                    "precision": round(tp / n, 4) if n else None,
                    "recall": round(tp / len(truth), 4),
                }

            report[f"k={k},w={w},min_shared={min_shared}"] = {
                "candidates_vs_substring_truth": stats(cand, substring_truth),
                "verified_vs_neardup_truth": stats(verified, true_pairs),
                "lifted_witnessed": len(cand & (lifted_pairs | dup_lifted)),
            }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
