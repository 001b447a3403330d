// Kjarni — C# binding over the kjarni C ABI (libkjarni.so / kjarni.dll).
//
// Rebuild of kjarni-ffi/bindings/csharp: the same NuGet-style surface
// (Classifier, Embedder, Reranker, Chat, Indexer, Searcher) as IDisposable
// wrappers over native handles.

using System;
using System.Collections.Generic;
using System.Runtime.InteropServices;
using System.Text.Json;

namespace Kjarni
{
    internal static class Native
    {
        private const string Lib = "kjarni";

        [DllImport(Lib)] internal static extern int kjarni_init();
        [DllImport(Lib)] internal static extern IntPtr kjarni_version();
        [DllImport(Lib)] internal static extern IntPtr kjarni_last_error();
        [DllImport(Lib)] internal static extern long kjarni_new(string task, string jsonOptions);
        [DllImport(Lib)] internal static extern void kjarni_free(long handle);
        [DllImport(Lib)] internal static extern IntPtr kjarni_call(long handle, string method, string jsonArgs);
        [DllImport(Lib)] internal static extern void kjarni_string_free(IntPtr s);
        [DllImport(Lib)] internal static extern int kjarni_stream_start(long handle, string method, string jsonArgs);
        [DllImport(Lib)] internal static extern IntPtr kjarni_stream_next(long handle);
        [DllImport(Lib)] internal static extern void kjarni_stream_cancel(long handle);

        static Native()
        {
            if (kjarni_init() != 0)
                throw new KjarniException(LastError());
        }

        internal static string LastError() =>
            Marshal.PtrToStringUTF8(kjarni_last_error()) ?? "unknown error";

        internal static string TakeString(IntPtr p)
        {
            if (p == IntPtr.Zero) throw new KjarniException(LastError());
            var s = Marshal.PtrToStringUTF8(p) ?? "";
            kjarni_string_free(p);
            return s;
        }
    }

    public class KjarniException : Exception
    {
        public KjarniException(string message) : base(message) { }
    }

    public abstract class KjarniObject : IDisposable
    {
        private protected long Handle;

        private protected KjarniObject(string task, string? model)
        {
            var opts = model == null ? "{}" :
                JsonSerializer.Serialize(new Dictionary<string, string> { ["model"] = model });
            Handle = Native.kjarni_new(task, opts);
            if (Handle == 0) throw new KjarniException(Native.LastError());
        }

        private protected JsonElement Call(string method, object args)
        {
            var json = JsonSerializer.Serialize(args);
            var result = Native.TakeString(Native.kjarni_call(Handle, method, json));
            return JsonDocument.Parse(result).RootElement;
        }

        public void Dispose()
        {
            if (Handle != 0)
            {
                Native.kjarni_free(Handle);
                Handle = 0;
            }
            GC.SuppressFinalize(this);
        }

        ~KjarniObject() => Dispose();
    }

    public record LabelScore(string Label, double Score);

    public record ClassificationResult(string Label, double Score, List<LabelScore> AllScores)
    {
        public override string ToString() => $"{Label} ({Score * 100:F1}%)";

        public string ToDetailedString()
        {
            var lines = new List<string>();
            foreach (var s in AllScores)
                lines.Add($"  {s.Label}: {s.Score * 100:F1}%");
            return string.Join("\n", lines);
        }
    }

    public sealed class Classifier : KjarniObject
    {
        public Classifier(string model = "distilbert-sentiment") : base("classifier", model) { }

        public ClassificationResult Classify(string text)
        {
            var r = Call("classify", new { text });
            var all = new List<LabelScore>();
            foreach (var pair in r.GetProperty("all_scores").EnumerateArray())
                all.Add(new LabelScore(pair[0].GetString()!, pair[1].GetDouble()));
            return new ClassificationResult(
                r.GetProperty("label").GetString()!,
                r.GetProperty("score").GetDouble(), all);
        }
    }

    public sealed class Embedder : KjarniObject
    {
        public Embedder(string model = "minilm-l6-v2") : base("embedder", model) { }

        public float[] Encode(string text)
        {
            var r = Call("embed", new { text });
            var vec = r.GetProperty("embedding");
            var outArr = new float[vec.GetArrayLength()];
            int i = 0;
            foreach (var v in vec.EnumerateArray()) outArr[i++] = (float)v.GetDouble();
            return outArr;
        }

        public double Similarity(string a, string b) =>
            Call("similarity", new { a, b }).GetProperty("similarity").GetDouble();
    }

    public sealed class Reranker : KjarniObject
    {
        public Reranker(string model = "minilm-l6-v2-cross-encoder") : base("reranker", model) { }

        public List<(int Index, double Score, string Text)> Rerank(string query, string[] documents)
        {
            var r = Call("rerank", new { query, documents });
            var results = new List<(int, double, string)>();
            foreach (var item in r.GetProperty("results").EnumerateArray())
                results.Add((item.GetProperty("index").GetInt32(),
                             item.GetProperty("score").GetDouble(),
                             item.GetProperty("text").GetString()!));
            return results;
        }
    }

    public sealed class Chat : KjarniObject
    {
        public Chat(string model = "qwen2.5-0.5b-instruct") : base("chat", model) { }

        public string Send(string message) =>
            Call("send", new { message }).GetProperty("reply").GetString()!;

        public IEnumerable<string> Stream(string message)
        {
            var json = JsonSerializer.Serialize(new { message });
            if (Native.kjarni_stream_start(Handle, "stream", json) != 0)
                throw new KjarniException(Native.LastError());
            while (true)
            {
                var p = Native.kjarni_stream_next(Handle);
                if (p == IntPtr.Zero) yield break;
                yield return Native.TakeString(p);
            }
        }
    }

    public enum SearchMode { Keyword, Semantic, Hybrid }

    public sealed class Indexer : KjarniObject
    {
        public Indexer(string model = "minilm-l6-v2", bool quiet = false) : base("indexer", model) { }

        public void Create(string indexPath, string[] paths) =>
            Call("create", new { index_path = indexPath, paths });
    }

    public sealed class Searcher : KjarniObject
    {
        public Searcher(string model = "minilm-l6-v2", string? rerankerModel = null)
            : base("searcher", model) { }

        public List<(double Score, string Text)> Search(
            string indexPath, string query, SearchMode mode = SearchMode.Hybrid, int topK = 10)
        {
            var r = Call("search", new
            {
                index_path = indexPath,
                query,
                mode = mode.ToString().ToLowerInvariant(),
                top_k = topK
            });
            var results = new List<(double, string)>();
            foreach (var item in r.GetProperty("results").EnumerateArray())
                results.Add((item.GetProperty("score").GetDouble(),
                             item.GetProperty("text").GetString()!));
            return results;
        }
    }
}
