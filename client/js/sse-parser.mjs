/**
 * SSE event-stream parser for oramacore_tpu answer/autoquery streams.
 *
 * Counterpart of the reference's Deno sse-parser
 * (client/js/sse-parser/main.ts) — original implementation, same
 * surface: an `EventsStreamTransformer` TransformStream turning raw
 * bytes into typed events, plus the state/progress vocabularies the
 * answer and advanced-autoquery state machines emit.
 */

export const STATES_STEPS = [
  'initializing', 'handle_gpu_overload', 'get_llm_config',
  'determine_query_strategy', 'simple_rag', 'advanced_autoquery',
  'handle_system_prompt', 'optimize_query', 'execute_search',
  'execute_before_answer_hook', 'generate_answer',
  'generate_related_queries', 'completed', 'error',
  'advanced_autoquery_initializing', 'advanced_autoquery_analyzing_input',
  'advanced_autoquery_query_optimized',
  'advanced_autoquery_select_properties',
  'advanced_autoquery_properties_selected',
  'advanced_autoquery_combine_queries',
  'advanced_autoquery_queries_combined',
  'advanced_autoquery_generate_tracked_queries',
  'advanced_autoquery_tracked_queries_generated',
  'advanced_autoquery_execute_before_retrieval_hook',
  'advanced_autoquery_hooks_executed',
  'advanced_autoquery_execute_searches',
  'advanced_autoquery_search_results', 'advanced_autoquery_completed',
];

/**
 * Transforms a byte stream of `data: <json>\n\n` frames into parsed
 * event objects. Handles split chunks, \r\n\r\n delimiters, multi-line
 * data fields, comments (`: ...`) and the `[DONE]` sentinel.
 */
export class EventsStreamTransformer extends TransformStream {
  constructor() {
    const decoder = new TextDecoder('utf-8');
    let buffer = '';

    const emit = (block, controller) => {
      const dataLines = [];
      for (const line of block.split(/\r?\n/)) {
        if (line.startsWith('data:')) {
          dataLines.push(line.slice(5).replace(/^ /, ''));
        }
        // field lines other than data: (event:, id:, retry:, comments)
        // are tolerated and ignored, per the SSE spec subset we emit
      }
      if (!dataLines.length) return;
      const payload = dataLines.join('\n');
      if (payload === '[DONE]') return;
      try {
        controller.enqueue(JSON.parse(payload));
      } catch {
        controller.enqueue({ type: 'raw', data: payload });
      }
    };

    super({
      start() { buffer = ''; },
      transform(chunk, controller) {
        buffer += decoder.decode(chunk, { stream: true });
        for (;;) {
          const lf = buffer.indexOf('\n\n');
          const crlf = buffer.indexOf('\r\n\r\n');
          let end = -1, len = 0;
          if (lf !== -1 && (crlf === -1 || lf < crlf)) { end = lf; len = 2; }
          else if (crlf !== -1) { end = crlf; len = 4; }
          if (end === -1) break;
          emit(buffer.slice(0, end), controller);
          buffer = buffer.slice(end + len);
        }
      },
      flush(controller) {
        if (buffer.trim()) emit(buffer, controller);
      },
    });
  }
}

/** Async-iterate parsed SSE events from a fetch Response body. */
export async function* parseSSE(response) {
  const reader = response.body.pipeThrough(new EventsStreamTransformer())
    .getReader();
  for (;;) {
    const { done, value } = await reader.read();
    if (done) return;
    yield value;
  }
}
