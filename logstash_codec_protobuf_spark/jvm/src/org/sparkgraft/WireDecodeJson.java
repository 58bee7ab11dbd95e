package org.sparkgraft;

import java.util.ArrayList;
import java.util.Base64;
import java.util.List;
import java.util.concurrent.ConcurrentHashMap;

import org.apache.spark.sql.api.java.UDF2;
import org.sparkproject.connect.protobuf.DescriptorProtos;
import org.sparkproject.connect.protobuf.Descriptors;
import org.sparkproject.connect.protobuf.DynamicMessage;
import org.sparkproject.connect.protobuf.util.JsonFormat;

/**
 * JVM-side protobuf wire decode: payload bytes -> canonical JSON string,
 * with NO Python workers anywhere in the plan.
 *
 * This is the in-sandbox stand-in for the spark-protobuf module's
 * from_protobuf (the 100 TB cluster path, reference hot loop
 * lib/logstash/codecs/protobuf.rb:212-218): the sandbox ships no
 * spark-protobuf jar and no network to fetch one, but the Spark Connect jar
 * shades a COMPLETE protobuf-java runtime (DynamicMessage + Descriptors +
 * JsonFormat under org.sparkproject.connect.protobuf), so a dynamic decode
 * against the engine's own compiled FileDescriptorSet
 * (logstash_codec_protobuf_spark/descriptors.py) is expressible without any
 * vendored dependency. The Spark side parses the JSON with from_json
 * (Catalyst-native) into the same `decoded` struct the Arrow paths emit.
 *
 * Config string (second argument, a literal column — parsed once, cached):
 *   base64(FileDescriptorSet) + "|" + message full name + "|" + dialect
 * dialect "pb3": enums print as NAMES, no-presence scalars always printed
 * (proto3 default emission, matching the Arrow decoder contract);
 * dialect "pb2": enums print as ints (codes pass through, protobuf.rb:134-136).
 *
 * Returns null on any parse failure -> the caller's PERMISSIVE
 * dead-letter struct (same contract as the Arrow decoder's error row).
 */
public class WireDecodeJson implements UDF2<byte[], String, String> {

    private static final ConcurrentHashMap<String, Entry> CACHE =
        new ConcurrentHashMap<>();

    private static final class Entry {
        final Descriptors.Descriptor descriptor;
        final JsonFormat.Printer printer;

        Entry(Descriptors.Descriptor descriptor, JsonFormat.Printer printer) {
            this.descriptor = descriptor;
            this.printer = printer;
        }
    }

    private static Entry load(String cfg) {
        try {
            String[] parts = cfg.split("\\|", -1);
            byte[] setBytes = Base64.getDecoder().decode(parts[0]);
            DescriptorProtos.FileDescriptorSet set =
                DescriptorProtos.FileDescriptorSet.parseFrom(setBytes);
            List<Descriptors.FileDescriptor> files = new ArrayList<>();
            for (DescriptorProtos.FileDescriptorProto fdp : set.getFileList()) {
                files.add(Descriptors.FileDescriptor.buildFrom(
                    fdp, files.toArray(new Descriptors.FileDescriptor[0])));
            }
            String want = parts[1];
            Descriptors.Descriptor descriptor = null;
            for (Descriptors.FileDescriptor fd : files) {
                for (Descriptors.Descriptor d : fd.getMessageTypes()) {
                    if (d.getFullName().equals(want)) {
                        descriptor = d;
                    }
                }
            }
            if (descriptor == null) {
                throw new IllegalArgumentException(
                    "message not in descriptor set: " + want);
            }
            // Both dialects emit defaults for absent no-presence scalars
            // (the engine's Arrow decoder contract, pb_wire.py decode plan);
            // pb2 differs only in enum handling: codes pass through as ints
            // (protobuf.rb:134-136). The caller sends a proto3-syntax
            // descriptor for both so the no-presence rule applies.
            JsonFormat.Printer printer = JsonFormat.printer()
                .preservingProtoFieldNames()
                .omittingInsignificantWhitespace()
                .alwaysPrintFieldsWithNoPresence();
            if (parts.length > 2 && "pb2".equals(parts[2])) {
                printer = printer.printingEnumsAsInts();
            }
            return new Entry(descriptor, printer);
        } catch (Exception e) {
            throw new IllegalArgumentException(
                "bad wire-decode config: " + e, e);
        }
    }

    @Override
    public String call(byte[] payload, String cfg) {
        if (payload == null || cfg == null) {
            return null;
        }
        Entry entry = CACHE.computeIfAbsent(cfg, WireDecodeJson::load);
        try {
            DynamicMessage message =
                DynamicMessage.parseFrom(entry.descriptor, payload);
            return entry.printer.print(message);
        } catch (Exception e) {
            return null;  // dead-letter: caller substitutes the error struct
        }
    }

    /** Jar-less smoke entry: {@code java ... WireDecodeJson <cfg> <hex>}
     * prints the decoded JSON (or {@code <null>}) — lets the build script
     * verify the shaded runtime end-to-end without a Spark session. */
    public static void main(String[] args) throws Exception {
        byte[] payload = new byte[args[1].length() / 2];
        for (int i = 0; i < payload.length; i++) {
            payload[i] = (byte) Integer.parseInt(
                args[1].substring(2 * i, 2 * i + 2), 16);
        }
        String out = new WireDecodeJson().call(payload, args[0]);
        System.out.println(out == null ? "<null>" : out);
    }
}
