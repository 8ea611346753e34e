// Node test: SSE parser unit cases + (when ORAMA_URL is set) a live
// client round-trip against a running server. Run from pytest
// (tests/test_js_sdk.py) or manually:
//   node client/js/test.mjs
//   ORAMA_URL=http://localhost:8080 MASTER=... node client/js/test.mjs
import assert from 'node:assert';
import { EventsStreamTransformer } from './sse-parser.mjs';
import { OramaCoreClient } from './client.mjs';

async function collect(chunks) {
  const enc = new TextEncoder();
  const stream = new ReadableStream({
    start(c) { for (const ch of chunks) c.enqueue(enc.encode(ch)); c.close(); },
  }).pipeThrough(new EventsStreamTransformer());
  const out = [];
  const r = stream.getReader();
  for (;;) {
    const { done, value } = await r.read();
    if (done) break;
    out.push(value);
  }
  return out;
}

// whole frames
let evs = await collect(['data: {"type":"acknowledged"}\n\n']);
assert.deepStrictEqual(evs, [{ type: 'acknowledged' }]);

// frame split across chunks + \r\n\r\n delimiters + [DONE]
evs = await collect([
  'data: {"type":"answer_tok', 'en","token":"hi"}\r\n\r\n',
  ': comment\n\n',
  'data: [DONE]\n\n',
]);
assert.deepStrictEqual(evs, [{ type: 'answer_token', token: 'hi' }]);

// multi-line data fields join with \n
evs = await collect(['data: "a\ndata: b"\n\n']);
assert.deepStrictEqual(evs, ['a\nb']);

console.log('sse-parser unit tests OK');

const url = process.env.ORAMA_URL;
if (url) {
  const client = new OramaCoreClient(url, {
    master: process.env.MASTER,
    write: process.env.WRITE_KEY,
    read: process.env.READ_KEY,
  });
  const res = await client.search(process.env.COLLECTION, {
    term: process.env.TERM || 'keyboard',
  });
  assert.ok(res.count >= 1, JSON.stringify(res));
  const batch = await client.searchBatch(process.env.COLLECTION, [
    { term: process.env.TERM || 'keyboard' },
    { term: 'nothing-matches-this' },
  ]);
  assert.ok(Array.isArray(batch.results) && batch.results.length === 2);
  console.log('live client round-trip OK');
}
