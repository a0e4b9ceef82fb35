/*
 * Offline ScoreData renderer: result.json → SVG notation, no CDN, no build.
 *
 * Capability parity with the reference's VexFlow components
 * (reference: frontend/components/ScoreViewer.tsx:115-297 — staves, beams
 * per time-signature groups, dots, tuplets, ties, responsive measure
 * layout; frontend/components/LeadSheet.tsx — slash-notation lead sheet
 * with chord symbols). Everything is drawn as primitive SVG (ellipses,
 * paths, lines), so a finished job renders with zero network access.
 */
"use strict";

const NS = "http://www.w3.org/2000/svg";
const LINE_GAP = 9;            // distance between staff lines
const STAFF_LINES = 5;
const STEP_INDEX = { c: 0, d: 1, e: 2, f: 3, g: 4, a: 5, b: 6 };

function el(name, attrs, parent) {
  const e = document.createElementNS(NS, name);
  for (const k in attrs) e.setAttribute(k, attrs[k]);
  if (parent) parent.appendChild(e);
  return e;
}

function textEl(parent, x, y, str, size, opts) {
  const t = el("text", Object.assign({ x, y, "font-size": size,
    "font-family": "Georgia, 'Times New Roman', serif" }, opts || {}), parent);
  t.textContent = str;
  return t;
}

/* "f#/4" → {step, acc, octave, diatonic index from C0} */
function parseKey(key) {
  const m = /^([a-gA-G])([#bn]{0,2})\/(\d+)$/.exec(key.trim());
  if (!m) return null;
  const step = m[1].toLowerCase();
  return {
    step,
    acc: m[2] || "",
    octave: parseInt(m[3], 10),
    diat: STEP_INDEX[step] + 7 * parseInt(m[3], 10),
  };
}

/* diatonic index → y offset on a treble staff (E4 = bottom line). */
function staffY(topY, diat) {
  const e4 = STEP_INDEX.e + 7 * 4;
  const bottom = topY + (STAFF_LINES - 1) * LINE_GAP;
  return bottom - (diat - e4) * (LINE_GAP / 2);
}

const DUR_QUARTERS = { w: 4, h: 2, q: 1, 8: 0.5, 16: 0.25, 32: 0.125 };

function itemQuarters(item) {
  let q = DUR_QUARTERS[String(item.duration)] || 1;
  let add = q / 2;
  for (let i = 0; i < (item.dots || 0); i++) { q += add; add /= 2; }
  if (item.tuplet && item.tuplet.num_notes > 0)
    q *= item.tuplet.notes_occupied / item.tuplet.num_notes;
  return q;
}

/* Key-signature accidental layout (treble): diatonic positions. */
const SHARP_ORDER = ["f/5", "c/5", "g/5", "d/5", "a/4", "e/5", "b/4"];
const FLAT_ORDER = ["b/4", "e/5", "a/4", "d/5", "g/4", "c/5", "f/4"];
const KEY_ACC_STEPS = { sharp: ["f", "c", "g", "d", "a", "e", "b"],
                        flat: ["b", "e", "a", "d", "g", "c", "f"] };

function drawAccidental(g, x, y, acc) {
  if (acc === "#") {
    for (const dx of [0, 3.4])
      el("line", { x1: x + dx, y1: y - 6, x2: x + dx, y2: y + 6, stroke: "#000", "stroke-width": 1 }, g);
    for (const dy of [-2.2, 2.2])
      el("line", { x1: x - 2.2, y1: y + dy + 1.2, x2: x + 5.6, y2: y + dy - 1.2, stroke: "#000", "stroke-width": 1.7 }, g);
  } else if (acc === "b") {
    el("line", { x1: x, y1: y - 8, x2: x, y2: y + 3.5, stroke: "#000", "stroke-width": 1.1 }, g);
    el("path", { d: `M ${x} ${y + 3.5} C ${x + 6} ${y - 2} ${x + 4} ${y - 5} ${x} ${y - 1}`,
      fill: "none", stroke: "#000", "stroke-width": 1.1 }, g);
  } else if (acc === "n") {
    el("line", { x1: x, y1: y - 6, x2: x, y2: y + 3, stroke: "#000", "stroke-width": 1 }, g);
    el("line", { x1: x + 4, y1: y - 3, x2: x + 4, y2: y + 6, stroke: "#000", "stroke-width": 1 }, g);
    el("line", { x1: x, y1: y - 2, x2: x + 4, y2: y - 4, stroke: "#000", "stroke-width": 1.6 }, g);
    el("line", { x1: x, y1: y + 4, x2: x + 4, y2: y + 2, stroke: "#000", "stroke-width": 1.6 }, g);
  }
}

function drawTrebleClef(g, x, topY) {
  // simplified G-clef: a spiral around the G line with a tall stroke
  const gLine = topY + 3 * LINE_GAP;
  el("path", {
    d: `M ${x + 7} ${topY - 12}
        C ${x + 15} ${topY - 4} ${x + 13} ${topY + 8} ${x + 6} ${topY + 16}
        C ${x - 1} ${topY + 24} ${x - 2} ${topY + 31} ${x + 5} ${gLine + 4}
        C ${x + 11} ${gLine + 9} ${x + 18} ${gLine + 3} ${x + 15} ${gLine - 4}
        C ${x + 12} ${gLine - 10} ${x + 3} ${gLine - 8} ${x + 3} ${gLine}
        C ${x + 3} ${gLine + 5} ${x + 8} ${gLine + 7} ${x + 11} ${gLine + 5}`,
    fill: "none", stroke: "#000", "stroke-width": 1.8, "stroke-linecap": "round" }, g);
  el("line", { x1: x + 7, y1: topY - 12, x2: x + 9, y2: gLine + 13,
    stroke: "#000", "stroke-width": 1.4 }, g);
  el("circle", { cx: x + 9.5, cy: gLine + 14.5, r: 2.2, fill: "#000" }, g);
}

function drawRest(g, x, topY, duration) {
  const mid = topY + 2 * LINE_GAP;
  const d = String(duration);
  if (d === "w") {
    el("rect", { x: x, y: topY + LINE_GAP, width: 12, height: 4.5, fill: "#000" }, g);
  } else if (d === "h") {
    el("rect", { x: x, y: topY + 2 * LINE_GAP - 4.5, width: 12, height: 4.5, fill: "#000" }, g);
  } else if (d === "q") {
    el("path", { d: `M ${x + 3} ${mid - 10} L ${x + 9} ${mid - 3} L ${x + 4} ${mid + 2}
                     L ${x + 9} ${mid + 8} C ${x + 3} ${mid + 6} ${x + 2} ${mid + 10} ${x + 6} ${mid + 13}
                     C ${x - 1} ${mid + 11} ${x + 0.5} ${mid + 5} ${x + 5} ${mid + 6} L ${x + 1} ${mid + 1}
                     L ${x + 6} ${mid - 4} Z`, fill: "#000" }, g);
  } else {
    const hooks = d === "8" ? 1 : d === "16" ? 2 : 3;
    el("line", { x1: x + 8, y1: mid - 6, x2: x + 3, y2: mid + 8 + (hooks - 1) * 4,
      stroke: "#000", "stroke-width": 1.3 }, g);
    for (let i = 0; i < hooks; i++) {
      const hy = mid - 4 + i * 6;
      el("path", { d: `M ${x + 8 - i * 1.5} ${hy} C ${x + 4} ${hy + 4} ${x + 1} ${hy + 2} ${x + 1} ${hy - 1}`,
        fill: "none", stroke: "#000", "stroke-width": 1.2 }, g);
      el("circle", { cx: x + 1.2, cy: hy - 1, r: 1.8, fill: "#000" }, g);
    }
  }
}

/* ------------------------------------------------------------------ */

function renderScore(container, result) {
  container.innerHTML = "";
  const score = result.score;
  if (!score || !score.measures || !score.measures.length) {
    container.textContent = "no score in result.json";
    return;
  }
  const tsParts = (result.time_signature || "4/4").split("/");
  const beatsPerBar = parseInt(tsParts[0], 10) || 4;
  const beatUnit = parseInt(tsParts[1], 10) || 4;
  const fifths = result.key_signature ? result.key_signature.fifths : 0;

  const width = Math.max(480, container.clientWidth || 920);
  const MEAS_MIN = 150;
  const perItem = 34;

  // chord label lookup by measure (chords carry seconds; measures are
  // beatsPerBar quarters at tempo)
  const beatSec = 60.0 / (result.tempo_bpm || 120);
  const measSec = beatSec * beatsPerBar * (4 / beatUnit);
  const chords = result.chords || [];
  const chordAt = (t) => {
    for (const c of chords) if (c.start <= t && t < c.end) return c.label;
    return null;
  };

  // --- layout into systems ---
  const systems = [];
  let current = [], x = 70;
  for (const m of score.measures) {
    const w = Math.max(MEAS_MIN, 28 + perItem * m.items.length);
    if (x + w > width - 10 && current.length) {
      systems.push(current);
      current = [];
      x = 70;
    }
    current.push({ measure: m, width: w });
    x += w;
  }
  if (current.length) systems.push(current);

  const SYS_H = 110;
  const svg = el("svg", { width, height: systems.length * SYS_H + 40, viewBox:
    `0 0 ${width} ${systems.length * SYS_H + 40}` }, container);
  textEl(svg, 70, 18, `♩ = ${Math.round(result.tempo_bpm || 120)}` +
    (result.key_signature ? `   ${result.key_signature.name}` : ""), 13,
    { "font-style": "italic" });

  let measureIdx = 0;
  const pendingTies = [];  // {x, y} of tie starts awaiting their stop

  systems.forEach((sys, si) => {
    const topY = 40 + si * SYS_H + 18;
    const g = el("g", {}, svg);
    // staff lines across the system
    const sysWidth = sys.reduce((a, s) => a + s.width, 0);
    for (let i = 0; i < STAFF_LINES; i++)
      el("line", { x1: 60, y1: topY + i * LINE_GAP, x2: 60 + sysWidth,
        y2: topY + i * LINE_GAP, stroke: "#444", "stroke-width": 1 }, g);
    drawTrebleClef(g, 63, topY);
    // key signature
    let ksX = 88;
    const order = fifths >= 0 ? SHARP_ORDER : FLAT_ORDER;
    for (let i = 0; i < Math.abs(fifths) && i < 7; i++) {
      const p = parseKey(order[i]);
      drawAccidental(g, ksX, staffY(topY, p.diat), fifths >= 0 ? "#" : "b");
      ksX += 9;
    }
    // time signature on the first system
    if (si === 0) {
      textEl(g, ksX + 4, topY + 2 * LINE_GAP - 2, tsParts[0], 17, { "font-weight": "bold" });
      textEl(g, ksX + 4, topY + 4 * LINE_GAP - 2, tsParts[1], 17, { "font-weight": "bold" });
      ksX += 18;
    }

    let mx = 60 + (si === 0 ? ksX - 60 : 36);
    const firstContentX = mx;
    const scaleX = (60 + sysWidth - firstContentX) / sys.reduce((a, s) => a + s.width, 0);

    sys.forEach((entry) => {
      const m = entry.measure;
      const mWidth = entry.width * scaleX;
      // chord symbol above the measure
      const label = chordAt(measureIdx * measSec + 1e-3);
      if (label && label !== "N")
        textEl(g, mx + 4, topY - 10, prettyChord(label), 13, { "font-weight": "bold" });

      // accidental state: start of measure = key signature
      const accState = {};
      const keySigAcc = fifths >= 0 ? "#" : "b";
      for (let i = 0; i < Math.abs(fifths) && i < 7; i++)
        accState[KEY_ACC_STEPS[fifths >= 0 ? "sharp" : "flat"][i]] = keySigAcc;

      const innerPad = 14;
      const n = m.items.length || 1;
      const step = (mWidth - innerPad * 2) / n;
      const drawn = [];   // per item: {x, ys[], stemUp, beamable}
      let beatPos = 0;

      m.items.forEach((item, ii) => {
        const ix = mx + innerPad + ii * step + step * 0.25;
        if (item.rest) {
          drawRest(g, ix, topY, item.duration);
          for (let d = 0; d < (item.dots || 0); d++)
            el("circle", { cx: ix + 14 + d * 5, cy: topY + 1.5 * LINE_GAP, r: 1.8, fill: "#000" }, g);
          drawn.push({ x: ix, rest: true, beat: Math.floor(beatPos) });
          beatPos += itemQuarters(item);
          return;
        }
        const parsed = (item.keys || []).map(parseKey).filter(Boolean);
        parsed.sort((a, b) => a.diat - b.diat);
        const ys = parsed.map((p) => staffY(topY, p.diat));
        const avgY = ys.reduce((a, b) => a + b, 0) / (ys.length || 1);
        const stemUp = avgY > topY + 2 * LINE_GAP;
        const hollow = item.duration === "w" || item.duration === "h";

        // ledger lines
        parsed.forEach((p, k) => {
          const y = ys[k];
          for (let ly = topY - LINE_GAP; ly >= y - 2; ly -= LINE_GAP)
            el("line", { x1: ix - 7, y1: ly, x2: ix + 9, y2: ly, stroke: "#444", "stroke-width": 1 }, g);
          for (let ly = topY + STAFF_LINES * LINE_GAP; ly <= y + 2; ly += LINE_GAP)
            el("line", { x1: ix - 7, y1: ly, x2: ix + 9, y2: ly, stroke: "#444", "stroke-width": 1 }, g);
        });

        // accidentals (draw when the note's accidental differs from state)
        let accX = ix - 10;
        parsed.forEach((p, k) => {
          const cur = accState[p.step + p.octave] !== undefined
            ? accState[p.step + p.octave] : (accState[p.step] || "");
          const want = p.acc === "n" ? "" : p.acc;
          if (want !== cur) {
            drawAccidental(g, accX, ys[k], p.acc || "n");
            accX -= 8;
          }
          accState[p.step + p.octave] = want;
        });

        // noteheads
        parsed.forEach((p, k) => {
          el("ellipse", { cx: ix, cy: ys[k], rx: 5.2, ry: 3.9,
            transform: `rotate(-18 ${ix} ${ys[k]})`,
            fill: hollow ? "none" : "#000", stroke: "#000", "stroke-width": 1.4 }, g);
          for (let d = 0; d < (item.dots || 0); d++)
            el("circle", { cx: ix + 9 + d * 5, cy: ys[k] - 2, r: 1.8, fill: "#000" }, g);
        });

        // stem (not for whole notes; flagged notes get their stem drawn by
        // the beam pass, which may re-anchor it to the beam line)
        const flags = { 8: 1, 16: 2, 32: 3 }[String(item.duration)] || 0;
        let stemX = null, stemEndY = null;
        if (item.duration !== "w") {
          stemX = stemUp ? ix + 5 : ix - 5;
          const extremeY = stemUp ? Math.min(...ys) : Math.max(...ys);
          const baseY = stemUp ? Math.max(...ys) : Math.min(...ys);
          stemEndY = extremeY + (stemUp ? -32 : 32);
          if (!flags)
            el("line", { x1: stemX, y1: baseY, x2: stemX, y2: stemEndY,
              stroke: "#000", "stroke-width": 1.4 }, g);
        }
        drawn.push({
          x: ix, ys, stemUp, stemX, stemEndY, flags,
          beat: Math.floor(beatPos + 1e-6),
          tie: item.tie, item,
        });
        beatPos += itemQuarters(item);
      });

      // beams: consecutive flagged notes within the same beat group
      let run = [];
      const flush = () => {
        if (run.length >= 2) {
          const up = run[0].stemUp;
          const beamY = up ? Math.min(...run.map((r) => r.stemEndY))
                           : Math.max(...run.map((r) => r.stemEndY));
          const maxFlags = Math.max(...run.map((r) => r.flags));
          for (let lvl = 0; lvl < maxFlags; lvl++) {
            const dy = (up ? 1 : -1) * lvl * 5;
            for (let k = 0; k < run.length - 1; k++) {
              if (run[k].flags > lvl && run[k + 1].flags > lvl)
                el("line", { x1: run[k].stemX, y1: beamY + dy, x2: run[k + 1].stemX,
                  y2: beamY + dy, stroke: "#000", "stroke-width": 3.4 }, g);
            }
          }
          run.forEach((r) => {
            const x1 = r.stemX;
            const baseY = r.stemUp ? Math.max(...r.ys) : Math.min(...r.ys);
            el("line", { x1, y1: baseY, x2: x1, y2: beamY, stroke: "#000", "stroke-width": 1.4 }, g);
          });
        } else if (run.length === 1) {
          const r = run[0];
          const baseY = r.stemUp ? Math.max(...r.ys) : Math.min(...r.ys);
          el("line", { x1: r.stemX, y1: baseY, x2: r.stemX, y2: r.stemEndY,
            stroke: "#000", "stroke-width": 1.4 }, g);
          for (let f = 0; f < r.flags; f++) {
            const dir = r.stemUp ? 1 : -1;
            const fy = r.stemEndY + dir * f * 6;
            el("path", { d: `M ${r.stemX} ${fy} C ${r.stemX + 8} ${fy + dir * 6}
              ${r.stemX + 8} ${fy + dir * 12} ${r.stemX + 3} ${fy + dir * 17}`,
              fill: "none", stroke: "#000", "stroke-width": 1.6 }, g);
          }
        }
        run = [];
      };
      drawn.forEach((d) => {
        if (d.rest || !d.flags) { flush(); return; }
        if (run.length && (run[0].beat !== d.beat || run[0].stemUp !== d.stemUp)) flush();
        run.push(d);
      });
      flush();

      // tuplet brackets
      let tRun = [];
      const flushTuplet = () => {
        if (tRun.length >= 2) {
          const y = Math.min(...tRun.map((r) => (r.rest ? topY : Math.min(...r.ys)))) - 14;
          const x1 = tRun[0].x - 6, x2 = tRun[tRun.length - 1].x + 8;
          el("path", { d: `M ${x1} ${y + 4} L ${x1} ${y} L ${x2} ${y} L ${x2} ${y + 4}`,
            fill: "none", stroke: "#000", "stroke-width": 1 }, g);
          textEl(g, (x1 + x2) / 2 - 3, y - 2, String(tRun[0].item.tuplet.num_notes), 11,
            { "font-style": "italic" });
        }
        tRun = [];
      };
      drawn.forEach((d) => {
        if (!d.rest && d.item && d.item.tuplet) tRun.push(d);
        else flushTuplet();
      });
      flushTuplet();

      // ties
      drawn.forEach((d) => {
        if (d.rest || !d.ys) return;
        if (d.tie === "stop" || d.tie === "continue") {
          const from = pendingTies.pop();
          if (from) {
            const sameSystem = Math.abs(from.y - d.ys[0]) < SYS_H / 2 && from.x < d.x;
            const x1 = sameSystem ? from.x + 6 : d.x - 22;
            const y = d.ys[0];
            el("path", { d: `M ${x1} ${y + 6} Q ${(x1 + d.x) / 2} ${y + 12} ${d.x - 2} ${y + 6}`,
              fill: "none", stroke: "#000", "stroke-width": 1.2 }, g);
          }
        }
        if (d.tie === "start" || d.tie === "continue")
          pendingTies.push({ x: d.x, y: d.ys[0] });
      });

      // barline
      el("line", { x1: mx + mWidth, y1: topY, x2: mx + mWidth,
        y2: topY + (STAFF_LINES - 1) * LINE_GAP, stroke: "#444", "stroke-width": 1 }, g);
      mx += mWidth;
      measureIdx += 1;
    });
  });
}

function prettyChord(label) {
  const parts = label.split(":");
  const root = parts[0].replace("#", "♯").replace("b", "♭");
  const q = parts[1] || "maj";
  const suffix = { maj: "", min: "m", 7: "7", maj7: "maj7", min7: "m7" }[q] !== undefined
    ? { maj: "", min: "m", 7: "7", maj7: "maj7", min7: "m7" }[q] : q;
  return root + suffix;
}

/* --------------------------- lead sheet --------------------------- */

function renderLeadSheet(container, result) {
  container.innerHTML = "";
  const chords = (result.chords || []).filter((c) => c.label);
  const beatsPerBar = parseInt((result.time_signature || "4/4").split("/")[0], 10) || 4;
  const beatSec = 60.0 / (result.tempo_bpm || 120);
  const measSec = beatSec * beatsPerBar;
  const end = chords.length ? Math.max(...chords.map((c) => c.end)) : 0;
  const nMeasures = Math.max(1, Math.ceil(end / measSec));
  const perLine = 4;
  const lines = Math.ceil(nMeasures / perLine);
  const width = Math.max(480, container.clientWidth || 920);
  const measW = Math.min(210, (width - 70) / perLine);
  const LINE_H = 86;

  const svg = el("svg", { width, height: lines * LINE_H + 30 }, container);
  textEl(svg, 40, 16, `♩ = ${Math.round(result.tempo_bpm || 120)}`, 12, { "font-style": "italic" });

  const labelAt = (t) => {
    let best = null;
    for (const c of chords) if (c.start <= t + 1e-3 && t < c.end) best = c.label;
    return best;
  };

  let last = null;
  for (let mi = 0; mi < nMeasures; mi++) {
    const li = Math.floor(mi / perLine);
    const topY = 34 + li * LINE_H + 14;
    const x0 = 40 + (mi % perLine) * measW;
    for (let i = 0; i < STAFF_LINES; i++)
      el("line", { x1: x0, y1: topY + i * LINE_GAP, x2: x0 + measW,
        y2: topY + i * LINE_GAP, stroke: "#555", "stroke-width": 1 }, svg);
    el("line", { x1: x0 + measW, y1: topY, x2: x0 + measW,
      y2: topY + 4 * LINE_GAP, stroke: "#555", "stroke-width": 1 }, svg);
    // rehearsal mark every 8 bars (reference lead-sheet style)
    if (mi % 8 === 0) {
      const letter = String.fromCharCode(65 + Math.floor(mi / 8) % 26);
      el("rect", { x: x0 - 2, y: topY - 26, width: 16, height: 16, fill: "none",
        stroke: "#000", "stroke-width": 1.2 }, svg);
      textEl(svg, x0 + 2, topY - 14, letter, 12, { "font-weight": "bold" });
    }
    const label = labelAt(mi * measSec);
    if (label && label !== "N" && label !== last)
      textEl(svg, x0 + 3, topY - 3, prettyChord(label), 14, { "font-weight": "bold" });
    if (label) last = label;
    // slash noteheads per beat
    for (let b = 0; b < beatsPerBar; b++) {
      const sx = x0 + 14 + b * ((measW - 24) / beatsPerBar);
      const y = topY + 2 * LINE_GAP;
      el("line", { x1: sx - 4, y1: y + 5, x2: sx + 4, y2: y - 5,
        stroke: "#000", "stroke-width": 3 }, svg);
    }
  }
}

/* ----------------------------- tablature ----------------------------- */

/*
 * Offline 6-line tablature view: fret numbers from tab_positions.json
 * (written by the pipeline alongside the MusicXML TAB part — reference
 * musicxml/export.py:150-291 renders the same data via OSMD online).
 * tabData = { tuning: [6 open-string MIDI numbers low→high],
 *             measures: [[ [[string, fret], ...] per item ] per measure] }
 * where string 1 = highest. Top tab line = string 1, as in standard tabs.
 */
const TAB_LINES = 6;
const TAB_GAP = 9;

function renderTab(container, result, tabData) {
  container.innerHTML = "";
  const score = result.score;
  if (!score || !score.measures || !score.measures.length) {
    container.textContent = "no score in result.json";
    return;
  }
  if (!tabData || !tabData.measures) {
    container.textContent = "no tab positions for this job";
    return;
  }
  const width = Math.max(480, container.clientWidth || 920);
  const MEAS_MIN = 150;
  const perItem = 34;

  const beatsPerBar = parseInt((result.time_signature || "4/4").split("/")[0], 10) || 4;
  const beatSec = 60.0 / (result.tempo_bpm || 120);
  const measSec = beatSec * beatsPerBar;
  const chords = result.chords || [];
  const chordAt = (t) => {
    for (const c of chords) if (c.start <= t && t < c.end) return c.label;
    return null;
  };

  // layout into systems (same packing as renderScore)
  const systems = [];
  let current = [], x = 70;
  score.measures.forEach((m, mi) => {
    const w = Math.max(MEAS_MIN, 28 + perItem * m.items.length);
    if (x + w > width - 10 && current.length) {
      systems.push(current);
      current = [];
      x = 70;
    }
    current.push({ measure: m, width: w, mi });
    x += w;
  });
  if (current.length) systems.push(current);

  const staffH = (TAB_LINES - 1) * TAB_GAP;
  const SYS_H = staffH + 64;
  const svg = el("svg", { width, height: systems.length * SYS_H + 40, viewBox:
    `0 0 ${width} ${systems.length * SYS_H + 40}` }, container);
  const tuningName = tabData.tuning && tabData.tuning.length === 6
    ? tabData.tuning.map(midiName).reverse().join(" ") : "";
  textEl(svg, 70, 18, `♩ = ${Math.round(result.tempo_bpm || 120)}` +
    (tuningName ? `   tuning ${tuningName}` : ""), 13, { "font-style": "italic" });

  systems.forEach((sys, si) => {
    const topY = 40 + si * SYS_H + 22;
    const g = el("g", {}, svg);
    const sysWidth = sys.reduce((a, s) => a + s.width, 0);
    for (let i = 0; i < TAB_LINES; i++)
      el("line", { x1: 60, y1: topY + i * TAB_GAP, x2: 60 + sysWidth,
        y2: topY + i * TAB_GAP, stroke: "#444", "stroke-width": 1 }, g);
    // TAB clef
    ["T", "A", "B"].forEach((ch, k) =>
      textEl(g, 64, topY + 13 + k * 13, ch, 13, { "font-weight": "bold" }));

    let mx = 60 + (si === 0 ? 26 : 26);
    const scaleX = (60 + sysWidth - mx) / sysWidth;

    sys.forEach((entry) => {
      const m = entry.measure;
      const mWidth = entry.width * scaleX;
      const label = chordAt(entry.mi * measSec + 1e-3);
      if (label && label !== "N")
        textEl(g, mx + 4, topY - 8, prettyChord(label), 13, { "font-weight": "bold" });

      const tabMeasure = tabData.measures[entry.mi] || [];
      const innerPad = 14;
      const n = m.items.length || 1;
      const step = (mWidth - innerPad * 2) / n;

      m.items.forEach((item, ii) => {
        const ix = mx + innerPad + ii * step + step * 0.25;
        const positions = tabMeasure[ii] || [];
        if (item.rest || !positions.length) {
          if (item.rest) {
            // small rest tick below the staff so rhythm gaps stay visible
            el("rect", { x: ix, y: topY + staffH + 10, width: 7, height: 3,
              fill: "#999" }, g);
          }
          return;
        }
        if (item.tie === "stop" || item.tie === "continue") {
          // sustained strum: tie arc instead of repeated fret numbers
          el("path", { d: `M ${ix - step * 0.6} ${topY + staffH + 8}
            Q ${ix - step * 0.3} ${topY + staffH + 14} ${ix} ${topY + staffH + 8}`,
            fill: "none", stroke: "#777", "stroke-width": 1.2 }, g);
          return;
        }
        positions.forEach(([str, fret]) => {
          if (!(str >= 1 && str <= 6)) return;
          const y = topY + (str - 1) * TAB_GAP;
          const txt = String(fret);
          // white halo so the number is readable on the line
          el("rect", { x: ix - 3 - (txt.length - 1) * 3, y: y - 5.5,
            width: 7 + (txt.length - 1) * 6, height: 11, fill: "#fff" }, g);
          textEl(g, ix - 3 - (txt.length - 1) * 3, y + 4, txt, 11,
            { "font-family": "system-ui, sans-serif" });
        });
        // rhythm stem below the staff (flags as tick marks)
        const flags = { 8: 1, 16: 2, 32: 3 }[String(item.duration)] || 0;
        if (item.duration !== "w") {
          const sy = topY + staffH + 4;
          el("line", { x1: ix, y1: sy, x2: ix, y2: sy + 12, stroke: "#000",
            "stroke-width": item.duration === "h" ? 0.8 : 1.3 }, g);
          for (let f = 0; f < flags; f++)
            el("line", { x1: ix, y1: sy + 12 - f * 3.5, x2: ix + 5,
              y2: sy + 9.5 - f * 3.5, stroke: "#000", "stroke-width": 1.2 }, g);
          for (let d = 0; d < (item.dots || 0); d++)
            el("circle", { cx: ix + 4 + d * 4, cy: sy + 14, r: 1.5, fill: "#000" }, g);
        }
      });

      el("line", { x1: mx + mWidth, y1: topY, x2: mx + mWidth,
        y2: topY + staffH, stroke: "#444", "stroke-width": 1 }, g);
      mx += mWidth;
    });
  });
}

const NOTE_NAMES = ["C", "C#", "D", "D#", "E", "F", "F#", "G", "G#", "A", "A#", "B"];
function midiName(m) {
  return NOTE_NAMES[((m % 12) + 12) % 12] + (Math.floor(m / 12) - 1);
}

window.AudiotabsScore = { renderScore, renderLeadSheet, renderTab };
