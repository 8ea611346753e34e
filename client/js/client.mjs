/**
 * Minimal JS client for oramacore_tpu (node >= 18 / browsers: relies on
 * fetch + web streams). Original code; mirrors the Python SDK
 * (oramacore_tpu/client.py) surface: collection/index admin, insert,
 * search, batched search, and the SSE answer stream.
 */

import { parseSSE } from './sse-parser.mjs';

export class OramaCoreClient {
  /**
   * @param {string} baseUrl e.g. "http://localhost:8080"
   * @param {{master?: string, write?: string, read?: string}} keys
   */
  constructor(baseUrl, keys = {}) {
    this.baseUrl = baseUrl.replace(/\/$/, '');
    this.keys = keys;
  }

  async _req(path, { method = 'POST', body, key } = {}) {
    const res = await fetch(this.baseUrl + path, {
      method,
      headers: {
        'Content-Type': 'application/json',
        ...(key ? { Authorization: `Bearer ${key}` } : {}),
      },
      body: body === undefined ? undefined : JSON.stringify(body),
    });
    if (!res.ok) {
      throw new Error(`${method} ${path} -> ${res.status}: ${await res.text()}`);
    }
    return res.json();
  }

  createCollection(id, opts = {}) {
    return this._req('/v1/collections/create', {
      body: { id, ...opts }, key: this.keys.master,
    });
  }

  createIndex(collection, id) {
    return this._req(`/v1/collections/${collection}/indexes/create`, {
      body: { id }, key: this.keys.write,
    });
  }

  insert(collection, index, documents) {
    return this._req(`/v1/collections/${collection}/indexes/${index}/insert`, {
      body: documents, key: this.keys.write,
    });
  }

  search(collection, params) {
    return this._req(`/v1/collections/${collection}/search`, {
      body: params, key: this.keys.read,
    });
  }

  /** TPU-native batched search (no reference counterpart). */
  searchBatch(collection, searches) {
    return this._req(`/v1/collections/${collection}/search/batch`, {
      body: { searches }, key: this.keys.read,
    });
  }

  /**
   * Stream answer events; yields parsed OramaSSEEvent objects.
   * @param {string} collection
   * @param {object} interaction {query, conversation?, ...}
   */
  async *answerStream(collection, interaction) {
    const res = await fetch(
      `${this.baseUrl}/v1/collections/${collection}/answer`,
      {
        method: 'POST',
        headers: {
          'Content-Type': 'application/json',
          Authorization: `Bearer ${this.keys.read}`,
        },
        body: JSON.stringify(interaction),
      },
    );
    if (!res.ok) {
      throw new Error(`answer -> ${res.status}: ${await res.text()}`);
    }
    yield* parseSSE(res);
  }

  /** Collect just the answer text from the SSE stream. */
  async answer(collection, interaction) {
    let text = '';
    for await (const ev of this.answerStream(collection, interaction)) {
      if (ev.type === 'answer_token') text += ev.token;
    }
    return text;
  }
}
